package graft

/** Every declared query must also run under ANSI mode (Spark 4's
  * default posture): the operators guard division (`try_divide`),
  * casts, and array access, so flipping the session to strict mode
  * must not turn any declared query into a runtime error. Smoke
  * tier data (sf0.001) keeps the sweep fast; correctness is the
  * oracle gate's job — this pins ERROR-FREEDOM under strict
  * semantics.
  */
class AnsiSweepSpec extends SparkSpec {

  test("all declared queries run clean under ANSI mode at sf0.001") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.ansi.enabled")
    try {
      conf.set("spark.sql.ansi.enabled", "true")
      // Drop memoized/cached tables materialized by earlier suites
      // under non-ANSI settings — otherwise the sweep would silently
      // skip re-executing the ETL under strict mode.
      graft.operators.OpCache.clear()
      graft.etl.CityBike.clearMemo()
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").count(); None }
        catch { case e: Throwable => Some(s"$name: ${String.valueOf(e.getMessage).take(120)}") }
      }
      assert(failures.isEmpty, s"ANSI failures:\n${failures.mkString("\n")}")
    } finally conf.set("spark.sql.ansi.enabled", saved)
  }
}
