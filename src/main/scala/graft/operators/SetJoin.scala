package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** EXACT-threshold set-similarity self-join via lossless prefix
  * filtering (the AllPairs/PPJoin family: Bayardo et al., WWW'07) —
  * the guaranteed-recall counterpart of the MinHash/SimHash
  * candidate generators in [[Dedup]]: every document pair with token
  * Jaccard ≥ t is returned, none missed, no LSH probability involved.
  *
  * Scale shape: order each document's distinct tokens by ascending
  * global document frequency (rarest first, ties by token string — a
  * deterministic total order); a pair at Jaccard ≥ t MUST share at
  * least one token among each side's first `|d| − ⌈t·|d|⌉ + 1`
  * tokens (removing that many leaves fewer than ⌈t·|d|⌉ — too few to
  * reach t even on a subset), so the inverted index is built over
  * PREFIXES only. Rare-first ordering makes those prefix postings the
  * SHORTEST lists in the corpus — the candidate join explodes
  * df²-style only on tokens that are rare by construction, while
  * stopword-class postings never enter the index. Verification is
  * one `array_intersect` per candidate pair (exact, codegen).
  */
object SetJoin {

  /** All pairs (doc_a < doc_b) with distinct-token Jaccard ≥ `t`.
    * Output: (doc_a, doc_b, inter, size_a, size_b, jaccard) — the
    * float is one exactly-rounded division of integers.
    */
  def jaccardJoin(
      docs: DataFrame,
      t: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(t > 0 && t <= 1, s"jaccardJoin: threshold must be in (0,1], got $t")
    val toks = OpCache.swap(
      s"setjoin.toks.$t",
      docs.select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
        .distinct())
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    // tokens per doc in (df asc, tok asc) order — struct sort gives
    // exactly that field-lexicographic total order
    val ordered = OpCache.swap(
      s"setjoin.ordered.$t",
      toks.join(dfreq, Seq("tok"))
        .groupBy(col("id"))
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ts"))
        .select(
          col("id"),
          transform(col("ts"), s => s.getField("tok")).as("toks"),
          size(col("ts")).as("sz")))
    // prefix length |d| − ⌈t·|d|⌉ + 1
    val prefixLen = (col("sz") - ceil(lit(t) * col("sz")) + 1).cast("int")
    val prefix = ordered.select(
      col("id"), explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
    val cands = prefix.as("a").join(prefix.as("b"), col("a.tok") === col("b.tok"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val ja = ordered.select(col("id").as("id_a"), col("toks").as("ta"), col("sz").as("sa"))
    val jb = ordered.select(col("id").as("id_b"), col("toks").as("tb"), col("sz").as("sb"))
    val inter = size(array_intersect(col("ta"), col("tb")))
    cands.join(ja, Seq("id_a")).join(jb, Seq("id_b"))
      .withColumn("inter", inter)
      // integer cross-multiply keeps the threshold exact: J ≥ t ⟺
      // inter ≥ t·(sa+sb−inter) ⟺ inter·1e6 ≥ t·1e6·(sa+sb−inter)
      .filter(
        col("inter").cast("long") * 1000000L >=
          lit(math.round(t * 1e6)) * (col("sa") + col("sb") - col("inter")).cast("long"))
      .select(
        col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("inter"), col("sa").as("size_a"), col("sb").as("size_b"),
        (col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")).cast("double")).as("jaccard"))
  }
}
