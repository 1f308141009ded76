package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorMean
import graft.operators.Skew

class SkewAndAggSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows on skewed data") {
    import sqlImplicits._
    // 90% of left rows share one hot key.
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong))
      .toDF("k", "row_id")
    val right = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "payload")
    val plain = left.join(right, Seq("k")).select("k", "row_id", "payload")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", col("row_id"), saltFactor = 8)
      .select("k", "row_id", "payload").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 2000)
  }

  test("salted two-phase aggregate equals the direct aggregate") {
    import sqlImplicits._
    val df = (1 to 5000).map(i => (if (i % 20 == 0) i.toLong % 10 else 3L, i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2)))).toSet
    val salted = Skew.saltedAggregate(df, "k", col("v"), 8)(
      _.agg(count(lit(1)).as("pn"), sum($"v").as("ps")))(
      _.agg(sum(col("pn")).as("n"), sum(col("ps")).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2)))).toSet
    assert(salted == direct)
  }

  test("VectorMean aggregator computes element-wise means with partial merge") {
    import sqlImplicits._
    val df = Seq(
      (0, Seq(1.0, 2.0, 3.0)), (0, Seq(3.0, 4.0, 5.0)),
      (1, Seq(10.0, 20.0, 30.0)))
      .toDF("g", "vec").repartition(4) // force merge() across partitions
    val out = df.groupBy("g").agg(VectorMean.vectorMean(col("vec")).as("mean"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(2.0, 3.0, 4.0))
    assert(out(1) == Seq(10.0, 20.0, 30.0))
  }

  test("VectorMean rejects ragged vectors instead of silently truncating") {
    import sqlImplicits._
    val df = Seq((0, Seq(1.0, 2.0, 3.0)), (0, Seq(1.0, 2.0))).toDF("g", "vec")
      .coalesce(1) // same partition → the mismatch hits reduce()
    val e = intercept[Exception] {
      df.groupBy("g").agg(VectorMean.vectorMean(col("vec")).as("mean")).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("ragged")))
  }
}
