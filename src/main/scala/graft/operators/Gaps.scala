package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over an integer sequence per key — the
  * continuity probe of activity data: which days/ids/offsets form
  * unbroken runs, where are the holes, how long is the longest
  * streak. The classic `value − row_number()` grouping: consecutive
  * values share a constant difference, so one window pass and one
  * aggregation find every maximal run exactly.
  *
  * Scale shape: everything is keyed — the window and both
  * aggregations partition by the key columns, so the shuffle is one
  * hash exchange on the key and no task ever sees more than one
  * key's (deduplicated) sequence values. Runs of consecutive values
  * collapse to one row each before any per-key summary.
  */
object Gaps {

  /** Maximal runs of consecutive integers per key over (possibly
    * duplicated) `seqCol` values. Output one row per island:
    * (keyCols*, island_start, island_end, island_len).
    */
  def islands(df: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val k = keyCols.map(col)
    val w = Window.partitionBy(k: _*).orderBy(col("__v").asc)
    df
      .filter(col(seqCol).isNotNull)
      .select(k :+ col(seqCol).cast("long").as("__v"): _*)
      .distinct()
      .withColumn("__grp", col("__v") - row_number().over(w))
      .groupBy(k :+ col("__grp"): _*)
      .agg(
        min(col("__v")).as("island_start"),
        max(col("__v")).as("island_end"),
        count(lit(1)).as("island_len"))
      .drop("__grp")
  }

  /** Per-key continuity summary: (keyCols*, n_values, n_islands,
    * longest_island, span_start, span_end, gap_values) where
    * `gap_values` counts the missing integers inside the key's span.
    */
  def islandSummary(df: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val k = keyCols.map(col)
    islands(df, keyCols, seqCol)
      .groupBy(k: _*)
      .agg(
        sum(col("island_len")).as("n_values"),
        count(lit(1)).as("n_islands"),
        max(col("island_len")).as("longest_island"),
        min(col("island_start")).as("span_start"),
        max(col("island_end")).as("span_end"))
      .withColumn(
        "gap_values", {
          // span arithmetic in DECIMAL: a key spanning more than
          // Long.MaxValue (e.g. seq values {−5e18, 5e18}) wrapped the
          // long subtraction to a NEGATIVE gap count with ANSI off.
          // The output stays BIGINT; a true gap count past int64
          // raises loudly instead of wrapping (gap ≥ 0 always, so
          // only the upper bound needs the check).
          val dec = org.apache.spark.sql.types.DecimalType(38, 0)
          val gap = col("span_end").cast(dec) - col("span_start").cast(dec) +
            lit(1) - col("n_values")
          coalesce(
            assert_true(gap <= lit(Long.MaxValue),
              concat(lit("islandSummary: gap_values overflows BIGINT for span ["),
                col("span_start"), lit(", "), col("span_end"), lit("]"))).cast("long"),
            gap.cast("long"))
        })
  }
}
