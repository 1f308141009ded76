package graft

import graft.operators.CorpusStats

class CorpusStatsSpec extends SparkSpec {

  test("zipfSlope recovers the exponent of a planted power law") {
    import sqlImplicits._
    // token w_r appears round(1000/r) times → ln f = ln 1000 − ln r,
    // slope ≈ −1 (quantization of round() perturbs slightly)
    val docs = (1 to 50).flatMap(r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"w$r")).grouped(97)
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val row = CorpusStats.zipfSlope(docs, topN = 50).head()
    assert(row.getLong(0) == 50L)
    val slope = row.getDouble(1)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope")
  }

  test("zipfSlope rank ties break deterministically by token") {
    import sqlImplicits._
    val docs = Seq((1L, "b b a a c")).toDF("doc_id", "text")
    val a = CorpusStats.zipfSlope(docs, topN = 3).head().getDouble(1)
    val b = CorpusStats.zipfSlope(docs.repartition(5), topN = 3).head().getDouble(1)
    assert(a == b)
  }

  test("heapsVocab counts first occurrences at exact quartile boundaries") {
    import sqlImplicits._
    // doc 1..4: docs 1-2 introduce a,b; doc 3 adds c; doc 4 adds d,e
    val docs = Seq(
      (1L, "a b a"), (2L, "a b"), (3L, "c a"), (4L, "d e c"))
      .toDF("doc_id", "text")
    val got = CorpusStats.heapsVocab(docs)
      .orderBy("prefix_pct")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    // quartiles of ids {1,2,3,4}: 1.75, 2.5, 3.25, 4
    assert(got.map(_._1).toSeq == Seq(25, 50, 75, 100))
    assert(got.map(_._2).toSeq == Seq(1.8, 2.5, 3.3, 4.0)) // rounded to 1 dp
    // vocab with first_id ≤ 1.75 → {a,b}; ≤2.5 → {a,b}; ≤3.25 → +c; ≤4 → all 5
    assert(got.map(_._3).toSeq == Seq(2L, 2L, 3L, 5L))
  }

  test("klDivergence: identical corpora give exactly 0, disjoint give positive both ways") {
    import sqlImplicits._
    val a = Seq((1L, "a b c a"), (2L, "b c d")).toDF("doc_id", "text")
    val same = CorpusStats.klDivergence(a, a).head()
    assert(same.getAs[Double]("kl_ab") == 0.0 && same.getAs[Double]("kl_ba") == 0.0)
    val b = Seq((3L, "x y z x"), (4L, "y z w")).toDF("doc_id", "text")
    val diff = CorpusStats.klDivergence(a, b).head()
    assert(diff.getAs[Long]("vocab") == 8L)
    assert(diff.getAs[Double]("kl_ab") > 0.1 && diff.getAs[Double]("kl_ba") > 0.1)
    assert(math.abs(diff.getAs[Double]("jeffreys") -
      (diff.getAs[Double]("kl_ab") + diff.getAs[Double]("kl_ba"))) < 1e-9)
  }
}
