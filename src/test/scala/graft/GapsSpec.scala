package graft

import graft.operators.Gaps

class GapsSpec extends SparkSpec {

  private def sample = {
    import sqlImplicits._
    Seq(
      // k1: {1,2,3, 7, 9,10} with a duplicate 2 — islands [1,3] [7,7] [9,10]
      ("k1", 1L), ("k1", 2L), ("k1", 2L), ("k1", 3L), ("k1", 7L), ("k1", 9L), ("k1", 10L),
      // k2: single value
      ("k2", 5L),
      // k3: fully consecutive
      ("k3", 4L), ("k3", 5L), ("k3", 6L))
      .toDF("k", "v")
  }

  test("islands finds maximal consecutive runs, ignoring duplicates") {
    val out = Gaps.islands(sample, Seq("k"), "v")
      .orderBy("k", "island_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("k1", 1L, 3L, 3L), ("k1", 7L, 7L, 1L), ("k1", 9L, 10L, 2L),
      ("k2", 5L, 5L, 1L),
      ("k3", 4L, 6L, 3L)))
  }

  test("islandSummary counts islands and interior gaps exactly") {
    val out = Gaps.islandSummary(sample, Seq("k"), "v")
      .orderBy("k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // k1: span [1,10] holds 10 slots, 6 present → 4 missing
    assert(out.toSeq == Seq(
      ("k1", 6L, 3L, 3L, 1L, 10L, 4L),
      ("k2", 1L, 1L, 1L, 5L, 5L, 0L),
      ("k3", 3L, 1L, 3L, 4L, 6L, 0L)))
  }

  test("a span wider than Long.MaxValue raises instead of wrapping negative") {
    import sqlImplicits._
    // span_end − span_start for {−5e18, 5e18} is 1e19 > Long.MaxValue:
    // the long subtraction wrapped to a large NEGATIVE gap count with
    // ANSI off — now the arithmetic runs in DECIMAL and overflowing
    // BIGINT raises loudly
    val wide = Seq(("k", -5000000000000000000L), ("k", 5000000000000000000L)).toDF("k", "v")
    intercept[Exception] { Gaps.islandSummary(wide, Seq("k"), "v").collect() }
    // ordinary negative-to-positive spans still come out exact
    val ok = Seq(("k", -3L), ("k", -2L), ("k", 2L)).toDF("k", "v")
    val r = Gaps.islandSummary(ok, Seq("k"), "v").collect().head
    assert(r.getLong(6) == 3L, r.toString) // missing −1, 0, 1
  }
}
