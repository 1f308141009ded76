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

  test("result is independent of partitioning") {
    val a = Resample.ffillGrid(sample.coalesce(1), Seq("k"), "ts", "v", 3600L)
      .collect().map(_.toSeq).toSet
    val b = Resample.ffillGrid(sample.repartition(7), Seq("k"), "ts", "v", 3600L)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
