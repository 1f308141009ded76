package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  /** Independent JVM reference: textbook BPE on a word-count map —
    * symbol LISTS (no string encoding), explicit leftmost-greedy merge
    * with skip, argmax by (count desc, left asc, right asc).
    */
  private def referenceBpe(
      words: Map[String, Long], k: Int): (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var dict: Map[String, (Seq[String], Long)] =
      words.map { case (w, c) => w -> (w.map(_.toString), c) }
    var merges = Vector.empty[(Int, String, String, Long)]
    for (i <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, wc)) <- dict; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + wc
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges :+= ((i, l, r, cnt))
        dict = dict.map { case (w, (syms, wc)) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              out += l + r; j += 2
            } else { out += syms(j); j += 1 }
          }
          w -> (out.toSeq, wc)
        }
      }
    }
    (merges, dict.map { case (w, (syms, _)) => w -> syms })
  }

  private def runEngine(corpus: Seq[String], k: Int) = {
    import sqlImplicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val trained = Bpe.train(docs, k, ckptEvery = 2)
    val merges = trained.merges.orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val segs = trained.dict
      .select(col("w"), filter(split(col("sym"), Bpe.Sep), x => x =!= "").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    (merges, segs)
  }

  private def wordCounts(corpus: Seq[String]): Map[String, Long] =
    corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("matches the textbook reference on the classic low/lower corpus") {
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest newest newest newest newest",
      "widest widest widest")
    val (gotM, gotS) = runEngine(corpus, 6)
    val (expM, expS) = referenceBpe(wordCounts(corpus), 6)
    assert(gotM == expM, s"merges\n got=$gotM\n exp=$expM")
    assert(gotS == expS, s"segmentation\n got=$gotS\n exp=$expS")
  }

  test("merge-space exhaustion before round k keeps the dictionary (no annihilation)") {
    import sqlImplicits._
    // 'ab' fully merges in ONE round; rounds 2..5 have an EMPTY argmax
    // frame — the old crossJoin against it wiped the dictionary and
    // train() silently returned an empty segmentation
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val trained = Bpe.train(docs, k = 5)
    val dict = trained.dict.collect().map(r => (r.getString(0), r.getString(1)))
    assert(dict.length == 1, s"dictionary must survive exhausted rounds: ${dict.toSeq}")
    assert(dict.head._1 == "ab" && dict.head._2 == Bpe.Sep + "ab" + Bpe.Sep, dict.head.toString)
    val merges = trained.merges.collect()
    assert(merges.length == 1, s"only round 1 has a real merge: ${merges.toSeq}")
    assert(Bpe.segmentation(trained).count() == 1)
  }

  test("overlapping pair runs merge leftmost-greedy (aaaa -> [aa,aa], aaa -> [aa,a])") {
    val corpus = Seq("aaaa aaaa aaa abab")
    val (gotM, gotS) = runEngine(corpus, 2)
    val (expM, expS) = referenceBpe(wordCounts(corpus), 2)
    assert(gotM == expM, s"merges\n got=$gotM\n exp=$expM")
    assert(gotS == expS, s"segmentation\n got=$gotS\n exp=$expS")
    // round 1 merges (a,a): the wrapped-separator encoding must take
    // BOTH pairs of aaaa and exactly one of aaa; abab is untouched
    // until a later (a,b) merge.
    assert(gotS("aaaa") == Seq("aa", "aa"), gotS.toString)
    assert(gotS("aaa") == Seq("aa", "a"), gotS.toString)
  }

  test("tie-break is (count desc, left asc, right asc) and cascades across rounds") {
    // "xy" and "yx" pairs both appear exactly 3 times: (x,y) < (y,x).
    val corpus = Seq("xy xy xy yx yx yx")
    val (gotM, _) = runEngine(corpus, 3)
    val (expM, _) = referenceBpe(wordCounts(corpus), 3)
    assert(gotM == expM, s"merges\n got=$gotM\n exp=$expM")
    assert(gotM.head._2 == "x" && gotM.head._3 == "y", gotM.toString)
  }

  test("dictionary filter drops non-ASCII and over-long words; single-char words add no pairs") {
    import sqlImplicits._
    val docs = Seq(
      (1L, "ok ok " + ("z" * 40) + " café x")).toDF("doc_id", "text")
    val dict = Bpe.wordDict(docs)
    val ws = dict.select("w").collect().map(_.getString(0)).toSet
    assert(ws == Set("ok", "x"), ws.toString)
    val (gotM, _) = runEngine(Seq("ok ok x"), 1)
    assert(gotM == Seq((1, "o", "k", 2L)), gotM.toString)
  }

  test("property: engine equals reference on random corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val vocab = Seq("ab", "abc", "aab", "bab", "aa", "ba", "cab", "abab")
      val corpus = Seq.fill(5)(
        Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val k = 1 + rnd.nextInt(5)
      val (gotM, gotS) = runEngine(corpus, k)
      val (expM, expS) = referenceBpe(wordCounts(corpus), k)
      assert(gotM == expM, s"trial $trial merges\n got=$gotM\n exp=$expM")
      assert(gotS == expS, s"trial $trial segs\n got=$gotS\n exp=$expS")
    }
  }
}
