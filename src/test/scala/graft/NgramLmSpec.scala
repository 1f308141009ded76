package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {

  test("bigram NLL matches the hand-computed add-half model") {
    import sqlImplicits._
    // corpus: "a b a" and "a b". bigrams: d1 = a→b, b→a; d2 = a→b.
    // c(a b)=2, c(b a)=1; histories: c_h(a)=2, c_h(b)=1; V=2.
    // p(b|a) = (2*2+1)/(2*2+2) = 5/6, p(a|b) = (2*1+1)/(2*1+2) = 3/4.
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val got = NgramLm.bigramNll(docs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val p_ba = 5.0 / 6.0
    val p_ab = 3.0 / 4.0
    val d1 = (-math.log(p_ba) - math.log(p_ab)) / 2
    val d2 = -math.log(p_ba)
    assert(got.map(_._1) == Seq(1L, 2L) && got.map(_._2) == Seq(2L, 1L))
    assert(math.abs(got(0)._3 - d1) < 1e-9 && math.abs(got(1)._3 - d2) < 1e-9, got.toString)
  }

  test("tokens containing the old separator byte do not merge bigram identities") {
    import sqlImplicits._
    // whitespace tokenization legally admits \u0001 INSIDE a token: the
    // old concat key made ("x\u0001y", "z") collide with ("x", "y\u0001z")
    // and extracted w1 = "x" for both — merged history counts skewed
    // both docs' nll to ln(8/3); the struct pair keeps them distinct
    val docs = Seq((1L, "x\u0001y z"), (2L, "x q")).toDF("doc_id", "text")
    val got = NgramLm.bigramNll(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // V = 4 distinct tokens; each bigram unique with its own history:
    // p = (2·1+1)/(2·1+4) = 1/2 → nll = ln 2 for both docs
    assert(got.map(_._1) == Seq(1L, 2L) && got.map(_._2) == Seq(1L, 1L), got.toString)
    got.foreach { case (_, _, nll) =>
      assert(math.abs(nll - math.log(2.0)) < 1e-9, s"expected ln2, got $nll")
    }
  }

  test("gibberish scores higher than repeated natural text") {
    import sqlImplicits._
    val natural = "the quick brown fox jumps over the lazy dog"
    val docs = ((1L to 20L).map(i => (i, natural)) :+
      (99L, "zq xv qk jw vz kx wj qz xq vk")).toDF("doc_id", "text")
    val scores = NgramLm.bigramNll(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(99L) > scores(1L) * 2, scores.toString)
  }

  test("docs with fewer than two tokens are absent; quantized form tracks the float form") {
    import sqlImplicits._
    val docs = Seq(
      (1L, "solo"), (2L, ""), (3L, "two tokens here and more words")).toDF("doc_id", "text")
    val float_ = NgramLm.bigramNll(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.operators.OpCache.clear()
    val quant = NgramLm.bigramNll(docs, quantizeMicroNats = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(float_.keySet == Set(3L) && quant.keySet == Set(3L))
    assert(math.abs(float_(3L) - quant(3L)) < 1e-5)
  }

  test("result is independent of partitioning") {
    import sqlImplicits._
    val docs = (1L to 60L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 2}"))
      .toDF("doc_id", "text")
    graft.operators.OpCache.clear()
    val a = NgramLm.bigramNll(docs.coalesce(1), quantizeMicroNats = true)
      .collect().map(_.toSeq).toSet
    graft.operators.OpCache.clear()
    val b = NgramLm.bigramNll(docs.repartition(13), quantizeMicroNats = true)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
