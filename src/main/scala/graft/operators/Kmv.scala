package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch on the portable md5
  * lane — the third member of the engine's cardinality family next to
  * HLL (`Hll`, register-based) and exact `countDistinct`: keep the k
  * smallest hash values per group; with the k-th smallest at fraction
  * `h_k / 2^48` of the hash space, the unbiased estimate is
  * `(k−1) · 2^48 / h_k` (Bar-Yossef et al. 2002; Beyer et al. 2007's
  * unbiased variant). Everything is integer: the 48-bit hash is the
  * first 12 md5 nibbles (exactly replayable in any engine), the
  * estimate one exact floor division.
  *
  * Scale shape: hashes are deduplicated per group (map-side combine),
  * then the k minima ride [[TopK]]'s bounded mergeable heap — the
  * shuffle carries ≤k rows per (group, map partition), never the
  * distinct-value table. A 48-bit hash negated into a double is exact
  * (< 2^53), so the heap's total order IS the hash order.
  */
object Kmv {

  /** First 12 md5 nibbles of the key as a 48-bit non-negative long —
    * the engine-portable hash lane (`conv` here ≡ per-nibble strpos
    * arithmetic in an ANSI oracle).
    */
  def hash48(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** Per-group KMV distinct estimate over `keyCol`. Output:
    * (groupCols*, n_kept, kth_hash, est_distinct) — `n_kept < k`
    * means the group's full distinct-hash set was seen and the
    * estimate is exact; otherwise `est = (k−1)·2^48 / h_k` floored.
    * Distinct values are counted at the HASH grain (a 48-bit
    * collision collapses two keys — deterministically, in any
    * engine).
    */
  def distinctSketch(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      k: Int = 256): DataFrame = {
    // k ≤ 32768 keeps (k−1)·2^48 ≤ 2^63 − 2^48 < Long.MaxValue — at
    // k = 32769 the product crosses 2^63 and wraps negative, turning
    // every estimate into garbage, so the bound is a hard require.
    require(k >= 2 && k <= 32768, s"distinctSketch: k=$k out of [2, 32768]")
    val space = 1L << 48
    val km1TimesSpace = (k - 1L) * space // exact: ≤ 2^63 − 2^48 for k ≤ 32768
    val hashes = df
      .filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ hash48(col(keyCol)).as("__h"): _*)
      .distinct()
    hashes
      .groupBy(groupCols.map(col): _*)
      // score = −h: "best k" under TopK's (score desc, id asc) order =
      // the k smallest hashes, exactly (−h is an exact double)
      .agg(TopK.topK(-col("__h").cast("double"), col("__h"), k).as("__top"))
      .select(
        groupCols.map(col) ++ Seq(
          size(col("__top")).cast("long").as("n_kept"),
          // best-first = hash-ascending → last kept = k-th minimum
          element_at(col("__top"), size(col("__top"))).getField("_2").as("kth_hash")): _*)
      .withColumn(
        "est_distinct",
        when(col("n_kept") < k, col("n_kept")).otherwise(
          // `div`, NOT `/`: Divide on longs executes in DOUBLE, and
          // the dividend (k−1)·2^48 exceeds 2^53 for k ≥ ~180 — the
          // rounded quotient could land one off the exact integer
          // division the DuckDB oracle's `//` computes (the pmod
          // subtraction already makes the numerator an exact
          // multiple, so IntegralDivide is exact by construction)
          expr(s"(${km1TimesSpace}L - pmod(${km1TimesSpace}L, kth_hash)) div kth_hash")))
  }
}
