package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — the gap-filling / resampling pass
  * that turns an irregular event stream into a fixed-step per-key
  * grid (dashboard series, feature windows, sensor uptime).
  *
  * Three steps, all key-local after one shuffle: bucket observations
  * to `stepSeconds` epochs (MAX aggregation per bucket — exact,
  * commutative, portable), explode each key's [min, max] bucket range
  * into the dense grid (`sequence` — grid size is data-spread/step,
  * never corpus-sized), and forward-fill empty buckets with
  * `last(…, ignoreNulls)` over the bucket order. Missing-ness is
  * explicit: `n` carries the per-bucket observation count, 0 for
  * filled gaps.
  */
object Resample {

  /** Per-key dense grid: `(keyCols*, bucket, n, v_ffill)` where
    * bucket = ⌊epoch_us/step⌋, `n` the observation count in that
    * bucket and `v_ffill` the forward-filled per-bucket MAX of
    * `valueCol`. Leading gaps before a key's first observation don't
    * exist (grid starts at the key's first bucket).
    */
  def ffillGrid(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"ffillGrid: step must be positive, got $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    val buckets = df
      .filter(col(tsCol).isNotNull)
      .groupBy((keyCols.map(col) :+
        expr(s"unix_micros($tsCol) div ${stepUs}L").as("bucket")): _*)
      .agg(max(col(valueCol)).as("v"), count(col(valueCol)).as("n"))
    val grid = buckets
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select((keyCols.map(col) :+ explode(sequence(col("b0"), col("b1"))).as("bucket")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(buckets, keyCols :+ "bucket", "left")
      .select(
        keyCols.map(col) ++ Seq(
          col("bucket"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("v"), ignoreNulls = true).over(w).as("v_ffill")): _*)
  }
}
