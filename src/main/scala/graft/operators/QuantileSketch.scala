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

  /** Histogram state for `df`: keys ++ (bucket, n, __lo, __hi, __nb).
    * NULL and NaN measure values are EXCLUDED — a non-value is not
    * quantile mass (counting it in bucket 0 would drag every estimate
    * toward `lo`); out-of-range real values clamp to the edge buckets
    * ([[graft.functions.CoreFunctions.bucketize]], shared with
    * ZOrder so the two bucketizations can never drift).
    *
    * The state RECORDS its own bucketization (`__lo`/`__hi`/`__nb`
    * literal columns): bucket indices are meaningless without it, and
    * a consumer supplying different parameters would silently decode
    * every estimate wrong — [[quantiles]] validates the recorded
    * parameters against its arguments and raises on mismatch.
    * Persisted state tables written BEFORE these columns existed do
    * not carry them and must be rebuilt from base data (merge/
    * quantiles fail on them with an unresolved-column analysis error
    * — loud, by design: backfilling parameters into an old state
    * would assert a provenance nobody recorded).
    */
  def rollup(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      lo: Double,
      hi: Double,
      nb: Int = 128): DataFrame =
    df.filter(value.isNotNull && !isnan(value.cast("double")))
      .groupBy(keys.map(col) :+
        graft.functions.CoreFunctions.bucketize(value, lo, hi, nb.toLong).as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("__lo", lit(lo))
      .withColumn("__hi", lit(hi))
      .withColumn("__nb", lit(nb))

  /** Additive merge of histogram states (any batches, any order). The
    * bucketization columns join the grouping key: states built with
    * the SAME parameters merge additively as before, while mixed
    * parameters survive as distinct rows that [[quantiles]] then
    * rejects loudly (they cannot be summed meaningfully).
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge of zero states")
    states.reduce(_ unionByName _)
      .groupBy((keys ++ Seq("bucket", "__lo", "__hi", "__nb")).map(col): _*)
      .agg(sum(col("n")).as("n"))
      // back to rollup's column order — merge output IS a state
      .select((keys ++ Seq("bucket", "n", "__lo", "__hi", "__nb")).map(col): _*)
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
    // The state carries its own bucketization — decoding it with
    // different parameters is silently wrong, so mismatches RAISE at
    // execution (row-level guard; no driver-side action added to a
    // lazy transform). Also rejects mixed-parameter rows a bad merge
    // let through.
    val checked = state.filter(
      when(
        col("__lo") =!= lit(lo) || col("__hi") =!= lit(hi) || col("__nb") =!= lit(nb),
        raise_error(concat(
          lit(s"QuantileSketch: state bucketized as (lo, hi, nb) = ("),
          col("__lo"), lit(", "), col("__hi"), lit(", "), col("__nb"),
          lit(s") but quantiles() was asked to decode ($lo, $hi, $nb)"))))
        .otherwise(lit(true)))
      .drop("__lo", "__hi", "__nb")
    // ONE window pass computes cum/total; every requested q reduces in
    // the same aggregation (min over a guarded bucket), and only the
    // tiny |keys|-row aggregate is reshaped to one row per (key, q).
    val cum = checked
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(keyCols: _*).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(keyCols: _*)))
    val agged = cum.groupBy(keyCols: _*).agg(
      min(when(
        col("cum").cast("double") >= lit(qs.head) * col("total").cast("double"),
        col("bucket"))).as("__b0"),
      qs.tail.zipWithIndex.map { case (q, i) =>
        min(when(
          col("cum").cast("double") >= lit(q) * col("total").cast("double"),
          col("bucket"))).as(s"__b${i + 1}")
      }: _*)
    val width = (hi - lo) / nb
    // one explode over a (q, est) struct array, not |qs| unioned
    // re-selects of the agged subtree: the union planned (and absent
    // exchange reuse, re-executed) the window+aggregate lineage once
    // per quantile for what is a constant-size unpivot of a
    // |keys|-row frame
    agged
      .select(keyCols :+ explode(array(qs.zipWithIndex.map { case (q, i) =>
        struct(
          lit(q).as("q"),
          (lit(lo) + col(s"__b$i").cast("double") * lit(width)).as("est"))
      }: _*)).as("__qe"): _*)
      .select(keyCols :+ col("__qe.q").as("q") :+ col("__qe.est").as("est"): _*)
  }
}
