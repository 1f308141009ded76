package graft

import org.apache.spark.sql.functions._

import graft.operators.TextSearch

/** BM25 search: ranking properties on a planted corpus — tf
  * saturation, idf weighting of rare terms, length normalization,
  * deterministic tie-breaks, top-k cut.
  */
class TextSearchSpec extends SparkSpec {
  import sqlImplicits._

  private def q(pairs: (String, String)*) = pairs.toSeq.toDF("query_id", "term")

  test("more matching occurrences rank higher; non-matching docs are absent") {
    val docs = Seq(
      (1L, "apple apple apple pear plum"),
      (2L, "apple pear plum quince fig"),
      (3L, "pear plum quince fig grape")).toDF("doc_id", "text")
    val r = TextSearch.bm25TopK(docs, q("qa" -> "apple"), topK = 10)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    assert(r == Seq((1L, 1), (2L, 2)))
  }

  test("a rare term outweighs a common one of equal tf") {
    // "common" is in every doc (idf ~ 0); "rare" in one.
    val docs = (1L to 20L).map { i =>
      val extra = if (i == 7L) "rare" else "filler"
      (i, s"common word pad $extra tail")
    }.toDF("doc_id", "text")
    val r = TextSearch.bm25TopK(docs, q("qx" -> "common", "qx" -> "rare"), topK = 3)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    assert(r.head == ((7L, 1)))
  }

  test("length normalization: same tf, shorter doc wins; ties break by doc_id") {
    val docs = Seq(
      (1L, "target one two three four five six seven eight nine"),
      (2L, "target one two"),
      (3L, "other words only here"),
      (4L, "target one two")).toDF("doc_id", "text")
    val r = TextSearch.bm25TopK(docs, q("ql" -> "target"), topK = 10)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    // docs 2 and 4 are identical (tie) → doc_id order; doc 1 longer → last
    assert(r == Seq((2L, 1), (4L, 2), (1L, 3)))
  }

  test("top-k cuts per query independently; duplicate query terms count once") {
    val docs = (1L to 8L).map(i => (i, "hit " * i.toInt + "pad")).toDF("doc_id", "text")
    val r = TextSearch.bm25TopK(
      docs, q("q1" -> "hit", "q1" -> "hit", "q2" -> "pad"), topK = 2)
    val byQuery = r.select("query_id", "doc_id")
      .as[(String, Long)].collect().toSeq.groupBy(_._1)
    assert(byQuery("q1").size == 2 && byQuery("q2").size == 2)
    // scores for q1 must equal the single-term query (dup term not double-counted)
    val single = TextSearch.bm25TopK(docs, q("q1" -> "hit"), topK = 2)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val dup = r.filter(col("query_id") === "q1")
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(dup == single)
  }
}
