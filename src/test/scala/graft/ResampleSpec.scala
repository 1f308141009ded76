package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Resample

class ResampleSpec extends SparkSpec {

  private def ts(hour: Int, min: Int = 0) =
    new Timestamp(1704067200000L + (hour * 60L + min) * 60000L) // 2024-01-01 UTC

  private def sample = {
    import sqlImplicits._
    Seq(
      // k1: obs in hours 0, 0, 3 — hours 1-2 are gaps to fill
      ("k1", ts(0, 10), 5.0), ("k1", ts(0, 50), 7.0), ("k1", ts(3), 2.0),
      // k2: single observation — one-bucket grid
      ("k2", ts(5), 1.0),
      // null ts must be ignored
      ("k1", null.asInstanceOf[Timestamp], 99.0))
      .toDF("k", "ts", "v")
  }

  test("grid is dense per key; gaps forward-fill; counts mark missing buckets") {
    val base = 1704067200000000L / 3600000000L // 2024-01-01 hour bucket
    val got = Resample.ffillGrid(sample, Seq("k"), "ts", "v", 3600L)
      .orderBy("k", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1) - base, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("k1", 0L, 2L, 7.0), // bucket MAX of 5.0/7.0
      ("k1", 1L, 0L, 7.0), // gap: forward-filled
      ("k1", 2L, 0L, 7.0),
      ("k1", 3L, 1L, 2.0),
      ("k2", 5L, 1L, 1.0)))
  }

  test("pre-1970 timestamps floor to the bucket below (negative epoch)") {
    import sqlImplicits._
    // 1969-12-31 23:30 UTC = epoch −1800 s → hour bucket −1, not 0
    // (truncation toward zero would land it in bucket 0).
    val df = Seq(("k", new Timestamp(-1800000L), 1.0)).toDF("k", "ts", "v")
    val got = Resample.ffillGrid(df, Seq("k"), "ts", "v", 3600L)
      .collect().map(r => r.getLong(1))
    assert(got.toSeq == Seq(-1L), s"got ${got.toSeq}")
  }

  test("a pathological key (wide spread, tiny step) fails loudly, not as a straggler") {
    import sqlImplicits._
    // 2001-bucket grid at a 1 s step against a 100-bucket cap.
    val df = Seq(
      ("k", new Timestamp(1704067200000L), 1.0),
      ("k", new Timestamp(1704067200000L + 2000000L), 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Resample.ffillGrid(df, Seq("k"), "ts", "v", 1L, maxGridPerKey = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("ffillGrid")), e.toString)
    // the same data passes under the default cap
    assert(Resample.ffillGrid(df, Seq("k"), "ts", "v", 1L).count() == 2001L)
  }

  test("null keys are excluded: no fabricated n=0 grids for unkeyed observations") {
    import sqlImplicits._
    val df = Seq(
      (Some("k1"), ts(0), 1.0), (Some("k1"), ts(2), 3.0),
      // unkeyed observations: the NULL-key grid could never re-match
      // its own buckets (null ≠ null in the equi-join), so every such
      // row claimed n=0 / v_ffill=NULL in buckets that held data
      (None, ts(0), 5.0), (None, ts(2), 9.0))
      .toDF("k", "ts", "v")
    val g = Resample.ffillGrid(df, Seq("k"), "ts", "v", 3600L)
    assert(g.filter(col("k").isNull).count() == 0, "no NULL-key grid rows")
    assert(g.filter(col("k") === "k1").count() == 3)
    val i = Resample.interpolateGrid(df, Seq("k"), "ts", "v", 3600L)
    assert(i.filter(col("k").isNull).count() == 0)
  }

  test("ewma drops null-ts rows (engine-dependent ordering); out-of-domain raises") {
    import sqlImplicits._
    val df = Seq(
      ("k", ts(0), 1L, 1.0), ("k", ts(1), 2L, 3.0),
      // Spark sorts a null ts FIRST, SQL's default ORDER BY sorts it
      // LAST — keeping the row makes every lag frame engine-dependent
      ("k", null.asInstanceOf[Timestamp], 3L, 100.0))
      .toDF("k", "ts", "id", "v")
    val out = Resample.ewma(df, Seq("k"), "ts", "id", "v", k = 2)
    assert(out.count() == 2, "null-ts rows have no position in the series")
    val lastRow = out.orderBy(col("ts").desc).head().getAs[Double]("ewma")
    assert(math.abs(lastRow - 7.0 / 3) < 1e-9, lastRow.toString) // (2·3 + 1·1)/3
    // a finite value outside DECIMAL(18,4) previously quantized to a
    // silent null reading — now it raises (the quantizable contract)
    val big = Seq(("k", ts(0), 1L, 2e14)).toDF("k", "ts", "id", "v")
    intercept[Exception] { Resample.ewma(big, Seq("k"), "ts", "id", "v").collect() }
    val bigI = Seq(("k", ts(0), 2e14)).toDF("k", "ts", "v")
    intercept[Exception] {
      Resample.interpolateGrid(bigI, Seq("k"), "ts", "v", 3600L).collect()
    }
  }

  test("positionless rows (null ts/key) cannot abort via the quantization guard") {
    import sqlImplicits._
    // the operator DROPS a null-ts/null-key row either way, so its
    // out-of-domain value must not raise (the r13 ADVICE finding: the
    // quantizable RAISE ran before the null-position filter in
    // interpolateGrid, aborting the whole job for a row it was about
    // to discard)
    val df = Seq(
      (Some("k"), Some(ts(0)), 1.0), (Some("k"), Some(ts(2)), 3.0),
      (Some("k"), None, 2e14), // null ts, out-of-domain value
      (None, Some(ts(1)), -9e15)) // null key, out-of-domain value
      .toDF("k", "ts", "v")
    val i = Resample.interpolateGrid(df, Seq("k"), "ts", "v", 3600L).collect()
    assert(i.length == 3, "k's 3-bucket grid; the bad rows silently dropped")
    // ewma too (it filters first by construction; pin it)
    val e2 = Resample.ewma(df.withColumn("id", lit(1L)), Seq("k"), "ts", "id", "v", k = 2)
    assert(e2.count() == 2)
  }

  test("result is independent of partitioning") {
    val a = Resample.ffillGrid(sample.coalesce(1), Seq("k"), "ts", "v", 3600L)
      .collect().map(_.toSeq).toSet
    val b = Resample.ffillGrid(sample.repartition(7), Seq("k"), "ts", "v", 3600L)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("ewma: hand-checked k=2 chain with renormalized prefix and null skip") {
    import sqlImplicits._
    val df = Seq(
      ("a", 1L, 1L, Some(1.0)), ("a", 2L, 2L, Some(2.0)), ("a", 3L, 3L, Some(3.0)),
      ("b", 1L, 4L, Some(5.0)), ("b", 2L, 5L, None), ("b", 3L, 6L, Some(7.0)))
      .toDF("k", "sec", "id", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"), col("v"))
    val got = graft.operators.Resample.ewma(df, Seq("k"), "ts", "id", "v", k = 2)
      .orderBy("k", "id").collect()
      .map(r => (r.getString(0), r.getLong(2), if (r.isNullAt(4)) null else r.getDouble(4)))
    // a: (2*1)/2, (2*2+1)/3, (2*3+2)/3 in value units
    assert(got(0) == ("a", 1L, (2.0 * 10000.0 / 2.0) / 10000.0))
    assert(got(1) == ("a", 2L, ((2 * 20000.0 + 10000.0) / 3.0) / 10000.0))
    assert(got(2) == ("a", 3L, ((2 * 30000.0 + 20000.0) / 3.0) / 10000.0))
    // b: null row yields null ewma; the row AFTER a null sees the null lag as weight 0
    assert(got(3) == ("b", 4L, 1.0 * 5.0))
    assert(got(4)._3 == null)
    assert(got(5) == ("b", 6L, (2.0 * 70000.0 / 2.0) / 10000.0))
  }

  test("ewma: partitioning invariance and full-window weights after k rows") {
    import sqlImplicits._
    val rnd = new scala.util.Random(21)
    val rows = for (k <- Seq("x", "y"); i <- 1 to 50)
      yield (k, i.toLong, (k + i).hashCode.toLong, rnd.nextDouble() * 10)
    val df = rows.toDF("k", "sec", "id", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"), col("v"))
    val a = graft.operators.Resample.ewma(df, Seq("k"), "ts", "id", "v", k = 8)
      .orderBy("k", "ts").collect().map(_.toSeq)
    val b = graft.operators.Resample.ewma(df.repartition(11), Seq("k"), "ts", "id", "v", k = 8)
      .orderBy("k", "ts").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // steady state: weights 128..1 over the last 8 quantized values
    val xs = rows.filter(_._1 == "x").sortBy(_._2).map(_._4)
    val units = xs.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000)
    val last8 = units.takeRight(8)
    val num = last8.zipWithIndex.map { case (u, i) => u * BigDecimal(1L << i) }.sum
    val exp = (num.toDouble / 255.0) / 10000.0
    val gotLast = a.filter(_.head == "x").last(4).asInstanceOf[Double]
    assert(math.abs(gotLast - exp) < 1e-12, s"$gotLast vs $exp")
  }

  test("interpolateGrid fills gaps linearly, keeps observed values, no extrapolation") {
    import sqlImplicits._
    val base = 1704067200000000L / 3600000000L
    // k1: 4 @hour0, 10 @hour3 → gaps at 1, 2 get 6, 8 (exact thirds)
    val df = Seq(
      ("k1", ts(0), 4.0), ("k1", ts(3), 10.0),
      // k2: single observation → one bucket, no gaps
      ("k2", ts(5), 1.5))
      .toDF("k", "ts", "v")
    val got = Resample.interpolateGrid(df, Seq("k"), "ts", "v", 3600L)
      .orderBy("k", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1) - base, r.getLong(2),
        Option(r.getAs[java.lang.Double]("v_interp"))))
    assert(got.toSeq == Seq(
      ("k1", 0L, 1L, Some(4.0: java.lang.Double)),
      ("k1", 1L, 0L, Some(6.0: java.lang.Double)),
      ("k1", 2L, 0L, Some(8.0: java.lang.Double)),
      ("k1", 3L, 1L, Some(10.0: java.lang.Double)),
      ("k2", 5L, 1L, Some(1.5: java.lang.Double))))
  }

  test("interpolateGrid truncates toward zero on non-exact negative slopes") {
    import sqlImplicits._
    // 10 @h0 → 9.9999 @h3: slope -1/3 of 0.0001·10000=1 micro per 3
    // buckets; gap at h1: 100000 + trunc(-1·1/3) = 100000 → 10.0
    val df = Seq(("k", ts(0), 10.0), ("k", ts(3), 9.9999)).toDF("k", "ts", "v")
    val got = Resample.interpolateGrid(df, Seq("k"), "ts", "v", 3600L)
      .orderBy("bucket").collect().map(_.getAs[Double]("v_interp"))
    assert(got.toSeq == Seq(10.0, 10.0, 10.0, 9.9999))
  }

  test("ewma at a deep lookback does not wrap the weighted numerator") {
    import sqlImplicits._
    // at k=50 the total weight is ~1.1e15; a value of 1e6 (1e10
    // micro-units) makes the long numerator ~1.1e25 — wrapped
    // silently with ANSI off. A constant series must give exactly
    // its own value at ANY k.
    val rows = (1 to 60).map(i =>
      ("k", new java.sql.Timestamp(i * 1000L), i.toLong, 1.0e6))
    val out = graft.operators.Resample.ewma(
        rows.toDF("g", "ts", "id", "v"), Seq("g"), "ts", "id", "v", k = 50)
      .collect().map(_.getAs[Double]("ewma"))
    assert(out.forall(v => math.abs(v - 1.0e6) < 1e-6),
      s"constant series must EWMA to itself, got ${out.take(5).toSeq}")
  }

  test("interpolation across a huge gap with large values does not wrap") {
    import sqlImplicits._
    // vu delta 1e13 times a ~1e6-bucket gap overflows the long
    // multiply (1e19 > Long.MaxValue) — the midpoint previously came
    // out wrapped-garbage with no error
    val step = 1L
    val gap = 1000000L
    val rows = Seq(
      ("k", new java.sql.Timestamp(0L), 0.0),
      ("k", new java.sql.Timestamp(gap * step * 1000L), 1.0e9))
    val mid = graft.operators.Resample.interpolateGrid(
        rows.toDF("g", "ts", "v"), Seq("g"), "ts", "v", step)
      .filter(col("bucket") === gap / 2).head().getAs[Double]("v_interp")
    assert(math.abs(mid - 5.0e8) < 1.0, s"midpoint should be ~5e8, got $mid")
  }
}
