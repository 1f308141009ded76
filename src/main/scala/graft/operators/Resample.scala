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
    *
    * Scale guard: the forward-fill window sorts each key's ENTIRE
    * grid in one task, so one key with a years-long spread at a
    * 1-second step would become a single monster partition at 100×.
    * `maxGridPerKey` bounds the per-key grid LOUDLY — the bound is
    * evaluated inside the plan (`assert_true` fused into the
    * `sequence` upper bound, no extra driver action), so a
    * pathological key fails the job with a named error instead of
    * silently producing a straggler task.
    */
  def ffillGrid(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      stepSeconds: Long,
      maxGridPerKey: Long = 2000000L): DataFrame = {
    require(stepSeconds > 0, s"ffillGrid: step must be positive, got $stepSeconds")
    // the µs conversion must not wrap: a step past Long.MaxValue/1e6
    // would go negative silently (ANSI off) and bucket arithmetic on a
    // negative modulus produces garbage grids instead of a loud error
    require(stepSeconds <= Long.MaxValue / 1000000L,
      s"ffillGrid: stepSeconds=$stepSeconds overflows microseconds")
    require(maxGridPerKey > 0, s"ffillGrid: maxGridPerKey must be positive, got $maxGridPerKey")
    val stepUs = stepSeconds * 1000000L
    // FLOOR division, not `div` (which truncates toward zero): a
    // pre-1970 timestamp has negative epoch micros and must land in
    // the bucket below — time bucketing floors. NOTE: DuckDB's
    // integer `//` TRUNCATES toward zero, so the oracle SQL spells
    // the same pmod-subtraction floor explicitly rather than using a
    // bare `//`. Subtracting the (always non-negative) pmod makes the
    // numerator an exact multiple, so the trailing `div` is exact for
    // either sign.
    val bucketExpr = expr(
      s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${stepUs}L)) div ${stepUs}L")
    val buckets = df
      // null KEYS are excluded like null ts: groupBy would build a
      // grid for the NULL-key group, but the non-null-safe equi-join
      // back to `buckets` can never match it — every NULL-key row
      // would fabricate n=0 / v_ffill=NULL "gap" rows in buckets that
      // actually contained observations
      .filter(keyCols.map(col(_).isNotNull).fold(col(tsCol).isNotNull)(_ && _))
      .groupBy((keyCols.map(col) :+ bucketExpr.as("bucket")): _*)
      .agg(max(col(valueCol)).as("v"), count(col(valueCol)).as("n"))
    // coalesce(assert_true(...), b1): the assert yields NULL when the
    // bound holds (so the sequence upper bound is b1) and raises
    // otherwise — fusing the guard into a needed expression keeps the
    // optimizer from pruning it.
    val guardedB1 = coalesce(
      assert_true(
        col("b1") - col("b0") < lit(maxGridPerKey),
        concat(
          lit(s"ffillGrid: per-key grid exceeds $maxGridPerKey buckets ("),
          col("b1") - col("b0") + 1,
          lit(s" needed at step=${stepSeconds}s) — raise stepSeconds or maxGridPerKey"))
      ).cast("long"),
      col("b1"))
    val grid = buckets
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select((keyCols.map(col) :+ explode(sequence(col("b0"), guardedB1)).as("bucket")): _*)
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

  /** Per-key dense grid with LINEAR interpolation for the gaps —
    * the other classic resample mode (ffill holds the last reading;
    * interpolation assumes the metric moved smoothly between
    * readings). Exactly portable: observed values quantize to micro
    * units, and each gap bucket gets
    * v_prev + trunc((v_next − v_prev)·(b − b_prev) / (b_next − b_prev))
    * — toward-zero integer division, matching DuckDB's integer `//`
    * (which truncates, unlike its float `//`); the residue choice is
    * sub-micro-unit. All integers. Buckets
    * before the first / after the last observation stay NULL (no
    * extrapolation). Output: (keyCols*, bucket, n, v_interp) with
    * v_interp back in value units.
    *
    * Same shape and `maxGridPerKey` guard as [[ffillGrid]]: one
    * shuffle, per-key sequence explode, two window passes (carry
    * previous / next observation).
    */
  def interpolateGrid(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      stepSeconds: Long,
      maxGridPerKey: Long = 2000000L): DataFrame = {
    require(stepSeconds > 0, s"interpolateGrid: step must be positive, got $stepSeconds")
    require(stepSeconds <= Long.MaxValue / 1000000L,
      s"interpolateGrid: stepSeconds=$stepSeconds overflows microseconds")
    require(maxGridPerKey > 0, s"interpolateGrid: maxGridPerKey must be positive, got $maxGridPerKey")
    val stepUs = stepSeconds * 1000000L
    val bucketExpr = expr(
      s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${stepUs}L)) div ${stepUs}L")
    val vu = col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
      .multiply(lit(10000)).cast("long")
    // Stats.quantizable: NaN excluded like null, a finite value
    // outside the DECIMAL(18,4) domain RAISES — it previously
    // quantized to a NULL vu silently, so the bucket read as a gap
    // (and got interpolated over) while n still counted the row.
    // Null keys excluded for the same reason as ffillGrid — and
    // excluded BEFORE the quantizable guard (the ewma ordering; the
    // r13 ADVICE finding): a positionless row (null ts/key) is dropped
    // by this operator either way, so its value must not be able to
    // abort the whole job just for exceeding the DECIMAL(18,4) domain.
    val buckets = Stats.quantizable(
        df.filter(keyCols.map(col(_).isNotNull).fold(col(tsCol).isNotNull)(_ && _)),
        valueCol, "interpolateGrid")
      .groupBy((keyCols.map(col) :+ bucketExpr.as("bucket")): _*)
      .agg(max(vu).as("vu"), count(lit(1)).as("n"))
    val guardedB1 = coalesce(
      assert_true(
        col("b1") - col("b0") < lit(maxGridPerKey),
        concat(
          lit(s"interpolateGrid: per-key grid exceeds $maxGridPerKey buckets ("),
          col("b1") - col("b0") + 1,
          lit(s" needed at step=${stepSeconds}s) — raise stepSeconds or maxGridPerKey"))
      ).cast("long"),
      col("b1"))
    val grid = buckets
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select((keyCols.map(col) :+ explode(sequence(col("b0"), guardedB1)).as("bucket")): _*)
    val wPrev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the NEXT observation via last-over-DESCENDING-order, not
    // first-over-(currentRow → unboundedFollowing): Spark evaluates a
    // growing-from-current frame by RESCANNING the remaining rows for
    // every row — O(grid²) per key, a multi-minute stall at a
    // 10⁶-bucket grid (inside maxGridPerKey) — while the running
    // unboundedPreceding frame is O(grid). Same rows in the frame
    // (buckets ≥ current), same nearest-above observation.
    val wNext = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = grid
      .join(buckets, keyCols :+ "bucket", "left")
      .withColumn("__obs", when(col("vu").isNotNull, struct(col("bucket").as("b"), col("vu"))))
      .withColumn("__p", last(col("__obs"), ignoreNulls = true).over(wPrev))
      .withColumn("__q", last(col("__obs"), ignoreNulls = true).over(wNext))
    // exact toward-zero integer interpolation (den > 0 always: next
    // observation is strictly after previous when the bucket is a
    // gap). The numerator multiplies in DECIMAL: a ~1e13 micro-unit
    // value delta across a ~1e6-bucket gap (well under maxGridPerKey)
    // overflows the long multiply and wrapped silently with ANSI off —
    // the oracle casts to HUGEINT for the same reason.
    val num = (col("__q.vu") - col("__p.vu"))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
      (col("bucket") - col("__p.b"))
    val den = col("__q.b") - col("__p.b")
    val interpU = when(col("vu").isNotNull, col("vu"))
      .when(
        col("__p").isNotNull && col("__q").isNotNull,
        col("__p.vu") + expr("__num div __den"))
    joined
      .withColumn("__num", num)
      .withColumn("__den", den)
      .select(
        keyCols.map(col) ++ Seq(
          col("bucket"),
          coalesce(col("n"), lit(0L)).as("n"),
          (interpU.cast("double") / lit(1e4)).as("v_interp")): _*)
  }

  /** Bounded-lookback exponential moving average (α = 1/2) over the
    * last `k` observations per key — the exponential-smoothing
    * feature of a metrics pipeline, made BIT-PORTABLE by construction:
    * the value is quantized to exact integer 1e-4 units, the weights
    * are powers of two (most-recent observation weighs 2^(k−1)), and
    * numerator/denominator are exact integer window sums with ONE
    * double division at the end. Truncating the tail at `k`
    * observations is what makes exactness possible (the untruncated
    * recurrence needs unbounded precision); with α = 1/2 the dropped
    * tail weighs 2^−k of the total — at the default k = 8, under 0.4%.
    *
    * One shuffle + one per-key sort (the window); the k−1 lags share
    * the single window frame. Output: input ordering columns plus
    * `ewma` (null for null values; earlier-than-k rows use the
    * available prefix, renormalized — den sums only realized weights).
    */
  def ewma(
      df: DataFrame, keyCols: Seq[String], tsCol: String, idCol: String,
      valueCol: String, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 62, s"ewma: lookback k=$k out of [1, 62]")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    // NaN (and null) values yield a null ewma and weigh 0 in their
    // neighbors' frames; a finite value OUTSIDE the DECIMAL(18,4)
    // quantization domain RAISES (the Stats.quantizable contract) —
    // it previously quantized to null silently, erasing a real
    // reading from the average with no signal
    val vd = col(valueCol).cast("double")
    val dec = col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
    val yu = when(vd.isNotNull && !isnan(vd),
      coalesce(
        assert_true(dec.isNotNull,
          concat(lit("ewma: value outside the DECIMAL(18,4) quantization domain: "),
            vd.cast("string"))).cast("long"),
        (dec * lit(10000).cast(org.apache.spark.sql.types.DecimalType(5, 0))).cast("long")))
    val terms = (0 until k).map { j =>
      val weight = 1L << (k - 1 - j)
      val lagv = if (j == 0) col("__yu") else lag(col("__yu"), j).over(w)
      // the weighted numerator accumulates in DECIMAL: the require
      // admits k up to 62, where Σ vu·2^(k-1-j) exceeds Long for
      // ordinary magnitudes (total weight ~4.6e18 at k=62) and the
      // long sum wrapped silently with ANSI off; decimal holds
      // |vu| ≤ 1e18 times 2⁶² comfortably inside 38 digits
      (when(lagv.isNotNull,
        lagv.cast(org.apache.spark.sql.types.DecimalType(38, 0)) * lit(weight))
        .otherwise(lit(0L).cast(org.apache.spark.sql.types.DecimalType(38, 0))),
        when(lagv.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df
      // a row without a timestamp has no position in the ordered
      // series — and Spark sorts null ts FIRST while SQL's default
      // ORDER BY sorts it LAST, so keeping such rows makes the lag
      // frames engine-dependent; null keys merge unrelated series into
      // one phantom window partition (the funnel/transitions class)
      .filter(keyCols.map(col(_).isNotNull).fold(col(tsCol).isNotNull)(_ && _))
      .select(
        keyCols.map(col) ++ Seq(col(tsCol), col(idCol), col(valueCol), yu.as("__yu")): _*)
      .withColumn(
        "ewma",
        when(col("__yu").isNull, null)
          .otherwise((num.cast("double") / den.cast("double")) / lit(10000.0)))
      .drop("__yu")
  }
}
