package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * public): rank raw-corpus documents by how much more likely a
  * TARGET-domain bag-of-words model makes them than the raw-corpus
  * model, log w(x) = Σ_tok log p_target(tok) − log p_raw(tok) — the
  * standard recipe for skewing a 100 TB crawl toward a small
  * high-quality target corpus before training.
  *
  * Both unigram models use add-1 smoothing over the SHARED vocabulary
  * (p(tok) = (c+1)/(N+V), V = |union vocab|), so every probability is
  * a ratio of integers. Each token's log-ratio is computed as four
  * `ln`s of integer-valued doubles and quantized to integer
  * micro-nats (the x99 portable-score convention): the per-document
  * score is then an exact integer sum under any aggregation order,
  * and a SQL oracle replays it bit-for-bit.
  *
  * Scale shape: two token-count aggregations (map-side combined) +
  * one broadcast of the per-token log-ratio table (vocabulary-sized,
  * df-bounded in practice) + one per-doc sum. No shuffle carries
  * anything document-sized except the final score table.
  */
object Dsir {

  /** Per-candidate-document importance scores against the target
    * slice. `targetPred` marks target rows (the quality corpus);
    * candidates are all other rows. Output: (doc_id, n_toks,
    * logratio) — logratio = Σ micro-nats / 1e6, higher = more
    * target-like.
    */
  def importanceScores(
      docs: DataFrame,
      targetPred: Column,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol), targetPred.as("__is_target"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val perTok = toks
      .groupBy(col("tok"))
      .agg(
        sum(when(col("__is_target"), 1L).otherwise(0L)).as("c_t"),
        sum(when(col("__is_target"), 0L).otherwise(1L)).as("c_s"))
    val totals = perTok.agg(
      sum(col("c_t")).as("n_t"),
      sum(col("c_s")).as("n_s"),
      count(lit(1)).as("v"))
    // micro-nat log-ratio per vocabulary entry: four lns of
    // integer-valued doubles (IEEE-identical across engines), one
    // round — then integers only
    val delta = round(
      (log((col("c_t") + lit(1L)).cast("double")) -
        log((col("n_t") + col("v")).cast("double")) -
        log((col("c_s") + lit(1L)).cast("double")) +
        log((col("n_s") + col("v")).cast("double"))) * lit(1e6)).cast("long")
    val tokScore = perTok
      .crossJoin(broadcast(totals))
      .select(col("tok"), delta.as("__delta"))
    toks
      .filter(!col("__is_target"))
      // the log-ratio table is vocabulary-sized but its post-aggregate
      // size estimate never shrinks below the corpus (aggregates
      // inherit child size), so unhinted the INITIAL plan shuffles the
      // corpus-sized token stream to meet it — the full-corpus shuffle
      // the scale contract above rules out. The size-guarded hint
      // broadcasts when the estimate fits; when it over-reads, AQE's
      // runtime re-plan converts the shuffle join to broadcast off the
      // vocabulary's ACTUAL size — either path avoids hard-coding an
      // unguarded broadcast of a frame that is only small by
      // assumption.
      .join(Broadcasting.maybeBroadcast(tokScore), Seq("tok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_toks"),
        (sum(col("__delta")).cast("double") / lit(1e6)).as("logratio"))
  }

  /** Top-k selection by importance (the resampling step's
    * deterministic certified face: take the k most target-like
    * candidates; ties → lowest id).
    */
  def selectTopK(scores: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"selectTopK: k must be positive, got $k")
    // global bounded top-k: the shuffle carries ≤ k rows per
    // partition, never the whole score table
    TopK.topKPerGroup(scores, Seq.empty, "logratio", idCol, k)
  }
}
