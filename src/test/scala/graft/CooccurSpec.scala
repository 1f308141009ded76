package graft

import org.apache.spark.sql.functions._

import graft.operators.Cooccur

class CooccurSpec extends SparkSpec {

  private def docs = {
    import sqlImplicits._
    Seq(
      (1L, "a b a c"),
      (2L, "b c b"),
      (3L, "a"),
      (4L, "")).toDF("doc_id", "text")
  }

  /** Brute-force reference: all within-doc pairs at distance 1..w. */
  private def brute(w: Int): Map[(String, String), Long] = {
    val ds = Seq("a b a c", "b c b", "a", "").map(_.split("\\s+").filter(_.nonEmpty))
    ds.flatMap { toks =>
      for {
        i <- toks.indices; d <- 1 to w if i + d < toks.length
        p = Seq(toks(i), toks(i + d)).sorted
      } yield (p(0), p(1))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  test("pairCounts equals the brute-force distance-band pairs") {
    for (w <- Seq(1, 2, 3)) {
      val got = Cooccur.pairCounts(docs, window = w, minPairCount = 1L)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == brute(w), s"window=$w")
    }
  }

  test("withLift carries exact counts and lift = pair_n*N/(cnt_a*cnt_b)") {
    val row = Cooccur.withLift(docs, window = 2, minPairCount = 2L)
      .filter(col("tok_a") === "a" && col("tok_b") === "b")
      .collect().head
    // corpus: tokens a,b,a,c,b,c,b,a → N=8, cnt(a)=3, cnt(b)=3, pair(a,b)=2
    assert(row.getLong(2) == 2L && row.getLong(3) == 3L && row.getLong(4) == 3L)
    assert(math.abs(row.getDouble(5) - 2.0 * 8 / 9) < 1e-12)
    assert(math.abs(row.getDouble(6) - math.log(2.0 * 8 / 9)) < 1e-12)
  }

  test("result is independent of partitioning") {
    val a = Cooccur.pairCounts(docs.coalesce(1), 2, 1L).collect().map(_.toSeq).toSet
    val b = Cooccur.pairCounts(docs.repartition(9), 2, 1L).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("plan joins on (doc_id, pos) — no cartesian, no theta join") {
    val plan = Cooccur.pairCounts(docs, 2, 1L).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }
}
