package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection harness: prints the formatted physical plan and
  * timed row count for one named SparkEntry query.
  *
  * Usage: runMain graft.Explain <queryName> [sfDir] [countOnly]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "all") {
      // one-line physical-plan audit per query: join strategies,
      // exchange count, whole-stage-codegen coverage, cartesians
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          def c(p: String) = p.r.findAllIn(plan).size
          val flags = Seq(
            "bhj" -> c("BroadcastHashJoin"), "smj" -> c("SortMergeJoin"),
            "shj" -> c("ShuffledHashJoin"), "bnlj" -> c("BroadcastNestedLoopJoin"),
            "cart" -> c("CartesianProduct"), "xchg" -> c("Exchange"),
            "wscg" -> c("WholeStageCodegen"), "scan" -> c("Scan parquet"))
            .collect { case (k, v) if v > 0 => s"$k=$v" }.mkString(" ")
          println(f"[audit] $n%-28s $flags")
        } catch { case e: Throwable => println(s"[audit] $n FAILED: ${e.getMessage.take(80)}") }
      }
    } else {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (!args.contains("countOnly")) df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[explain] $name rows=$n%d time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
