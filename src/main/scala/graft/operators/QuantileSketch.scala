package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-bin histogram quantiles — the percentile sibling of
  * [[IncrementalAgg]]: a per-key bucket-count state that merges
  * additively (associative/commutative, batch boundaries can't change
  * a bit) and answers any quantile with error bounded by one bucket
  * width. Unlike rank-based exact percentiles (a per-key global sort)
  * or `approx_percentile` (whose sketch state is not SQL-replayable),
  * the histogram is pure integer arithmetic end to end: bucketize →
  * count → cumulative sum → first bucket crossing q·total — every
  * step deterministic and bit-replayable by a DuckDB oracle (x57).
  *
  * Scale shape: `rollup` partial-aggregates to |keys|·nb rows;
  * `merge` shuffles states, not rows; `quantiles` windows over
  * |keys|·nb rows. The value range [lo, hi] must be known — the
  * normal case for monitored measures; out-of-range values clamp to
  * the edge buckets (their mass is counted, their position saturates).
  */
object QuantileSketch {

  private def bucketCol(value: Column, lo: Double, hi: Double, nb: Int): Column = {
    require(nb > 0, s"bucket count $nb must be positive")
    require(hi > lo, s"degenerate range [$lo, $hi]")
    val raw = floor((value.cast("double") - lit(lo)) / lit(hi - lo) * lit(nb.toDouble)).cast("long")
    coalesce(least(greatest(raw, lit(0L)), lit(nb.toLong - 1)), lit(0L))
  }

  /** Histogram state for `df`: keys ++ (bucket, n). */
  def rollup(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      lo: Double,
      hi: Double,
      nb: Int = 128): DataFrame =
    df.groupBy(keys.map(col) :+ bucketCol(value, lo, hi, nb).as("bucket"): _*)
      .agg(count(lit(1)).as("n"))

  /** Additive merge of histogram states (any batches, any order). */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge of zero states")
    states.reduce(_ unionByName _)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))
  }

  /** Quantile estimates from a state: one row per key per q —
    * (keys..., q, est) where est is the LEFT EDGE of the first bucket
    * whose cumulative count reaches q·total. True quantile lies in
    * [est, est + width): error < one bucket width by construction.
    */
  def quantiles(
      state: DataFrame,
      keys: Seq[String],
      qs: Seq[Double],
      lo: Double,
      hi: Double,
      nb: Int = 128): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"quantiles $qs out of (0,1]")
    val keyCols = keys.map(col)
    val cum = state
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(keyCols: _*).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(keyCols: _*)))
    val width = (hi - lo) / nb
    qs.map { q =>
      cum
        .filter(col("cum").cast("double") >= lit(q) * col("total").cast("double"))
        .groupBy(keyCols: _*)
        .agg(min(col("bucket")).as("bucket"))
        .select(
          keyCols :+ lit(q).as("q") :+
            (lit(lo) + col("bucket").cast("double") * lit(width)).as("est"): _*)
    }.reduce(_ unionByName _)
  }
}
