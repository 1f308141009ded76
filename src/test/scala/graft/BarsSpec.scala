package graft

import org.apache.spark.sql.functions._

import graft.operators.Bars

class BarsSpec extends SparkSpec {

  private def df(rows: Seq[(String, Long, Long, Double)]) = {
    import sqlImplicits._
    rows.toDF("k", "sec", "id", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"), col("v"))
  }

  test("hand-checked bar: open/high/low/close by (ts,id) order and time-weighted mean") {
    // bucket [0, 100): samples at 0s (v=2), 40s (v=6), 80s (v=4)
    // weights: 40s, 40s, 20s → twap = (2*40 + 6*40 + 4*20)/100 = 4.0
    val rows = Seq(("a", 0L, 1L, 2.0), ("a", 40L, 2L, 6.0), ("a", 80L, 3L, 4.0))
    val got = Bars.ohlcBars(df(rows), Seq("k"), "ts", "id", "v", bucketSeconds = 100L)
      .collect().head
    assert(got.getLong(1) == 0L && got.getLong(3) == 3L, got.toString)
    assert(got.getDouble(4) == 2.0 && got.getDouble(5) == 6.0 &&
      got.getDouble(6) == 2.0 && got.getDouble(7) == 4.0, got.toString)
    assert(math.abs(got.getDouble(8) - 4.0) < 1e-12, got.toString)
  }

  test("same-timestamp ticks: id breaks the tie, zero-weight sample drops out of twap") {
    // two ticks at t=0 (ids 1, 2), then t=50: open = id 1's value, the
    // id-1 tick has zero duration so twap sees only v=3 (50s) and v=9 (50s)
    val rows = Seq(("a", 0L, 1L, 7.0), ("a", 0L, 2L, 3.0), ("a", 50L, 3L, 9.0))
    val got = Bars.ohlcBars(df(rows), Seq("k"), "ts", "id", "v", bucketSeconds = 100L)
      .collect().head
    assert(got.getDouble(4) == 7.0 && got.getDouble(7) == 9.0, got.toString)
    assert(math.abs(got.getDouble(8) - 6.0) < 1e-12, got.toString)
  }

  test("buckets split correctly and the last sample of each bucket extends to the bucket end") {
    val rows = Seq(("a", 10L, 1L, 1.0), ("a", 110L, 2L, 5.0))
    val got = Bars.ohlcBars(df(rows), Seq("k"), "ts", "id", "v", bucketSeconds = 100L)
      .orderBy("bucket").collect()
    assert(got.length == 2)
    // each bucket has one sample: twap = that sample's value
    assert(math.abs(got(0).getDouble(8) - 1.0) < 1e-12, got(0).toString)
    assert(math.abs(got(1).getDouble(8) - 5.0) < 1e-12, got(1).toString)
    assert(got(0).getLong(1) == 0L && got(1).getLong(1) == 1L)
  }

  test("NaN ticks are excluded entirely; out-of-domain values raise; huge buckets refuse") {
    import sqlImplicits._
    // NaN previously poisoned high (NaN-is-largest) AND biased twap:
    // its weight entered the denominator while its term dropped out
    val rows = Seq(("a", 0L, 1L, 2.0), ("a", 40L, 2L, Double.NaN), ("a", 80L, 3L, 4.0))
    val got = Bars.ohlcBars(df(rows), Seq("k"), "ts", "id", "v", bucketSeconds = 100L)
      .collect().head
    assert(got.getLong(3) == 2L, got.toString) // n counts only real ticks
    assert(got.getDouble(5) == 4.0, s"high must not be NaN: $got")
    // weights over survivors: v=2 for 80s, v=4 for 20s → (2·80+4·20)/100
    assert(math.abs(got.getDouble(8) - 2.4) < 1e-12, got.toString)
    // a finite value outside DECIMAL(18,4) raises loudly instead of
    // silently shrinking the twap numerator
    intercept[Exception] {
      Bars.ohlcBars(df(Seq(("a", 0L, 1L, 1e15))), Seq("k"), "ts", "id", "v", 100L).collect()
    }
    // µs-overflow bucket widths refuse up front (the Resample guard)
    intercept[IllegalArgumentException] {
      Bars.ohlcBars(df(Seq(("a", 0L, 1L, 1.0))), Seq("k"), "ts", "id", "v",
        Long.MaxValue / 1000L)
    }
  }

  test("partitioning invariance") {
    val rnd = new scala.util.Random(31)
    val rows = for (k <- Seq("x", "y"); i <- 1 to 300)
      yield (k, rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble() * 100)
    val a = Bars.ohlcBars(df(rows), Seq("k"), "ts", "id", "v", 250L)
      .orderBy("k", "bucket").collect().map(_.toSeq)
    val b = Bars.ohlcBars(df(rows).repartition(13), Seq("k"), "ts", "id", "v", 250L)
      .orderBy("k", "bucket").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
