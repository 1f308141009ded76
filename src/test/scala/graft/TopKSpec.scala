package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkSpec {

  private def sample = {
    import sqlImplicits._
    // Skewed groups (g0 holds half the rows), duplicate scores to
    // exercise the id tie-break, plus nulls that must be dropped.
    val rows = (1 to 2000).map { i =>
      val g = if (i % 2 == 0) "g0" else s"g${i % 5}"
      val score: java.lang.Double = if (i % 97 == 0) null else (i % 13).toDouble
      (g, i.toLong, score)
    }
    rows.toDF("g", "id", "score")
  }

  private def windowed(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    sample
      .filter(col("score").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("int"), col("id"), col("score"))
  }

  test("topKPerGroup equals the window row_number formulation exactly") {
    val got = TopK.topKPerGroup(sample, Seq("g"), "score", "id", 7)
      .collect().map(_.toSeq).toSet
    val want = windowed(7).collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("result is independent of partitioning (mergeable partials)") {
    val one = TopK.topKPerGroup(sample.coalesce(1), Seq("g"), "score", "id", 5)
      .collect().map(_.toSeq).toSet
    val many = TopK.topKPerGroup(sample.repartition(17), Seq("g"), "score", "id", 5)
      .collect().map(_.toSeq).toSet
    assert(one == many)
  }

  test("groups smaller than k return all their rows, ranked") {
    import sqlImplicits._
    val tiny = Seq(("a", 1L, 3.0), ("a", 2L, 9.0), ("b", 3L, 1.0))
      .toDF("g", "id", "score")
    val out = TopK.topKPerGroup(tiny, Seq("g"), "score", "id", 10)
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 1, 2L, 9.0), ("a", 2, 1L, 3.0), ("b", 1, 3L, 1.0)))
  }

  test("plan partial-aggregates instead of window-sorting whole groups") {
    val plan = TopK.topKPerGroup(sample, Seq("g"), "score", "id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
    // Typed aggregator → ObjectHashAggregate with a partial phase
    // before the exchange: the shuffle carries ≤k rows per partition.
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash aggregate:\n$plan")
  }

  test("NaN scores cannot displace winners; non-integral ids are rejected loudly") {
    import sqlImplicits._
    // the aggregator's total order ranks NaN above every real score —
    // k NaN rows previously returned as the entire top-k
    val df = (Seq((1L, 5.0), (2L, 3.0), (3L, 1.0)) ++
      Seq((100L, Double.NaN), (101L, Double.NaN))).toDF("id", "s")
      .withColumn("g", org.apache.spark.sql.functions.lit("g"))
    val top = graft.operators.TopK.topKPerGroup(df, Seq("g"), "s", "id", 2)
      .collect().map(r => r.getAs[Long]("id")).toSeq
    assert(top == Seq(1L, 2L), s"NaN rows must not rank, got $top")
    val strIds = Seq(("a", 1.0)).toDF("id", "s")
      .withColumn("g", org.apache.spark.sql.functions.lit("g"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.TopK.topKPerGroup(strIds, Seq("g"), "s", "id", 1)
    }
    assert(e.getMessage.contains("integral"))
  }
}
