package graft

import org.apache.spark.sql.functions._

import graft.operators.Bitmap

class BitmapSpec extends SparkSpec {

  test("distinctByGroup equals count(distinct) incl. negatives, nulls, duplicates") {
    import sqlImplicits._
    val rows = Seq(
      ("a", Some(0L)), ("a", Some(0L)), ("a", Some(63L)), ("a", Some(64L)),
      ("a", Some(-1L)), ("a", Some(-64L)), ("a", Some(-65L)), ("a", None),
      ("b", Some(1000000L)), ("b", Some(1000001L)), ("b", Some(1000000L)),
      ("c", None))
    val df = rows.toDF("g", "id")
    val got = Bitmap.distinctByGroup(df, Seq("g"), "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.filter(col("id").isNotNull)
      .groupBy("g").agg(countDistinct(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(!got.contains("c")) // all-null group has no distinct ids
  }

  test("distinctByGroup is partitioning-independent on a dense space") {
    import sqlImplicits._
    val df = (1 to 20000).map(i => ("g", (i % 3777).toLong)).toDF("g", "id")
    val one = Bitmap.distinctByGroup(df.coalesce(1), Seq("g"), "id")
      .head().getLong(1)
    val many = Bitmap.distinctByGroup(df.repartition(13), Seq("g"), "id")
      .head().getLong(1)
    assert(one == 3777L && many == 3777L)
  }

  test("setOverlap computes exact intersection/union/jaccard") {
    import sqlImplicits._
    // left = 0..99, right = 50..129: inter 50, union 130
    val rows = (0 to 99).map(i => ("l", i.toLong)) ++
      (50 to 129).map(i => ("r", i.toLong)) ++
      Seq(("other", 5L)) // a third side value must be ignored
    val df = rows.toDF("side", "id")
    val r = Bitmap.setOverlap(df, "side", "l", "r", "id").head()
    assert(r.getAs[Long]("n_left") == 100L)
    assert(r.getAs[Long]("n_right") == 80L)
    assert(r.getAs[Long]("n_intersect") == 50L)
    assert(r.getAs[Long]("n_union") == 130L)
    assert(r.getAs[Long]("jaccard_micro") == math.round(50.0 * 1e6 / 130.0))
  }

  test("setOverlap handles a word shared by only one side") {
    import sqlImplicits._
    val df = Seq(("l", 0L), ("l", 1L), ("r", 640L)).toDF("side", "id")
    val r = Bitmap.setOverlap(df, "side", "l", "r", "id").head()
    assert(r.getAs[Long]("n_intersect") == 0L)
    assert(r.getAs[Long]("n_union") == 3L)
  }
}
