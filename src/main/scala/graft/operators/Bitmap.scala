package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distinct counting over dense integer ID spaces via chunked
  * bitmaps — the roaring-bitmap idea (Chambi et al. 2016, public)
  * reduced to Spark-native integer aggregates: pack each ID into one
  * bit of a 64-bit word keyed by `id div 64`, OR the words per
  * (group, word) with the built-in `bit_or` aggregate (map-side
  * combining — each partition contributes at most one word per key),
  * then count set bits.
  *
  * Why this beats `count(distinct)` at 100 TB on dense keys: the
  * exact-distinct shuffle carries one row PER DISTINCT VALUE per
  * group; the bitmap shuffle carries one row per OCCUPIED 64-ID
  * BLOCK — a 64× row reduction on dense spaces (user IDs, entity
  * surrogate keys), with the partial aggregation happening at scan
  * speed in whole-stage codegen. On sparse/wide ID spaces the win
  * disappears (each word holds ~1 bit) — that trade is the
  * documented contract, not a surprise.
  *
  * Everything is integer bit arithmetic → bit-identical in any
  * engine; the x132 oracle replays with plain COUNT(DISTINCT).
  */
object Bitmap {

  /** The bitmap STATE: one row per (group, occupied 64-ID word) with
    * the word's bit mask — the mergeable form ([[mergeWordStates]]
    * ORs two states; [[countsFromWords]] reads the count). NULL ids
    * are dropped (matching COUNT(DISTINCT)); negative ids get
    * floor-division words + non-negative `pmod` bits.
    */
  def wordsByGroup(df: DataFrame, groupCols: Seq[String], idCol: String): DataFrame =
    df.filter(col(idCol).isNotNull)
      .select(groupCols.map(col) :+ col(idCol).cast("long").as("__id"): _*)
      // floor word index: subtracting the (always non-negative) pmod
      // makes the numerator an exact multiple of 64, so `div`'s
      // toward-zero truncation is exact for either sign
      .withColumn("__w", expr("(__id - pmod(__id, 64L)) div 64L"))
      .withColumn("__b", pmod(col("__id"), lit(64L)).cast("int"))
      .groupBy(groupCols.map(col) :+ col("__w"): _*)
      .agg(expr("bit_or(shiftleft(1L, __b))").as("__mask"))

  /** Merge bitmap states: OR the masks per (group, word). Bit-OR is
    * idempotent and commutative, so any batch split folds to the
    * same state — the streaming-fold contract.
    */
  def mergeWordStates(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeWordStates: no states")
    states
      .map(_.select((groupCols.map(col) :+ col("__w") :+ col("__mask")): _*))
      .reduce(_ unionByName _)
      .groupBy(groupCols.map(col) :+ col("__w"): _*)
      .agg(expr("bit_or(__mask)").as("__mask"))
  }

  /** Exact distinct counts from a bitmap state. */
  def countsFromWords(words: DataFrame, groupCols: Seq[String]): DataFrame =
    words
      .groupBy(groupCols.map(col): _*)
      .agg(sum(expr("bit_count(__mask)")).cast("long").as("n_distinct"))

  /** Exact `n_distinct` of `idCol` per `groupCols` in one pass. */
  def distinctByGroup(df: DataFrame, groupCols: Seq[String], idCol: String): DataFrame =
    countsFromWords(wordsByGroup(df, groupCols, idCol), groupCols)

  /** Distinct-count of the INTERSECTION and UNION of two groups' ID
    * sets without materializing either set: per word, AND/OR the two
    * masks. Input: `df` filtered to exactly two values of `sideCol`;
    * output one row (n_left, n_right, n_intersect, n_union,
    * jaccard_micro) — the exact-set analogue of the MinHash estimate,
    * feasible whenever the ID space is dense enough to bitmap.
    */
  def setOverlap(
      df: DataFrame,
      sideCol: String,
      leftValue: String,
      rightValue: String,
      idCol: String): DataFrame = {
    val masked = df
      .filter(col(idCol).isNotNull && col(sideCol).isin(leftValue, rightValue))
      .select(
        (col(sideCol) === leftValue).as("__is_left"),
        col(idCol).cast("long").as("__id"))
      .withColumn("__w", expr("(__id - pmod(__id, 64L)) div 64L"))
      .withColumn("__b", pmod(col("__id"), lit(64L)).cast("int"))
      .groupBy(col("__w"))
      .agg(
        expr("bit_or(CASE WHEN __is_left THEN shiftleft(1L, __b) ELSE 0L END)").as("__l"),
        expr("bit_or(CASE WHEN NOT __is_left THEN shiftleft(1L, __b) ELSE 0L END)").as("__r"))
    masked
      .agg(
        sum(expr("bit_count(__l)")).cast("long").as("n_left"),
        sum(expr("bit_count(__r)")).cast("long").as("n_right"),
        sum(expr("bit_count(__l & __r)")).cast("long").as("n_intersect"),
        sum(expr("bit_count(__l | __r)")).cast("long").as("n_union"))
      // one exactly-rounded integer division — engine-portable
      .withColumn(
        "jaccard_micro",
        round(col("n_intersect") * lit(1000000L) / col("n_union")).cast("long"))
  }
}
