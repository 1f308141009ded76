package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSpec {

  private def docs = {
    import sqlImplicits._
    Seq(
      // target corpus: talks about alpha/beta
      (1L, "alpha beta alpha", true),
      (2L, "beta alpha beta beta", true),
      // candidates: one target-like, one off-domain, one mixed
      (10L, "alpha beta", false),
      (11L, "gamma delta gamma", false),
      (12L, "alpha gamma", false))
      .toDF("doc_id", "text", "is_t")
  }

  test("target-like candidates outscore off-domain ones") {
    val scores = Dsir.importanceScores(docs, col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.keySet == Set(10L, 11L, 12L)) // target docs are not scored
    assert(scores(10L) > scores(12L))
    assert(scores(12L) > scores(11L))
    assert(scores(10L) > 0) // more likely under target than raw
    assert(scores(11L) < 0) // gamma/delta never occur in target
  }

  test("scores replay the add-1 smoothed log ratio exactly") {
    // hand-computed for doc 10 ("alpha beta"):
    //   target: N_t = 7 (alpha×3, beta×4); source: N_s = 7; V = 4
    //   delta(tok) = round(1e6·(ln(c_t+1) − ln(N_t+V) − ln(c_s+1) + ln(N_s+V)))
    //   micro-sum over the doc's token occurrences / 1e6
    def delta(ct: Long, cs: Long): Long =
      math.round((math.log(ct + 1.0) - math.log(11.0) -
        math.log(cs + 1.0) + math.log(11.0)) * 1e6)
    val want = (delta(3, 2) + delta(4, 1)) / 1e6 // alpha, beta
    val got = Dsir.importanceScores(docs, col("is_t"))
      .filter(col("doc_id") === 10L).head().getDouble(2)
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
  }

  test("selectTopK ranks by score desc with id tie-break") {
    val top = Dsir.selectTopK(Dsir.importanceScores(docs, col("is_t")), 2)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(top.toSeq == Seq((1, 10L), (2, 12L)))
  }

  test("scores are independent of partitioning") {
    val a = Dsir.importanceScores(docs.coalesce(1), col("is_t"))
      .collect().map(_.toSeq).toSet
    val b = Dsir.importanceScores(docs.repartition(7), col("is_t"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
