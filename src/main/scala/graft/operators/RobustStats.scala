package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group dispersion statistics — the outlier-screening
  * pass of a data-quality pipeline (fence bad sensor readings, clip
  * degenerate document scores) using order statistics instead of
  * moment statistics, so a single wild value cannot drag the fences.
  *
  * Exact percentiles (`percentile`, linear interpolation — the same
  * definition as DuckDB's `quantile_cont`) require per-group sorted
  * aggregation: one shuffle per pass. [[iqrOutliers]] is two passes
  * (fences, then a broadcast join-back to classify) — at 100 TB swap
  * the exact percentile for [[QuantileSketch]] buckets and keep the
  * same two-pass shape; the contract here is the exact, oracled one.
  */
object RobustStats {

  /** Null-safe group join-back shared by every two-pass operator
    * here: `df` joined to its group-cardinality aggregate on the
    * group keys with `<=>` (the bandedCum convention), so a NULL
    * group behaves exactly like a window PARTITION BY would. The
    * plain usingColumns equality these operators used silently
    * DROPPED every null-group row — from operators documented as
    * row-preserving (imputeMedian, winsorize, iqrOutliers). The
    * aggregate side is broadcast while it fits, and its key copies
    * are dropped after the join.
    */
  /** NaN carries no order statistic: under Spark's NaN-is-largest
    * ordering a handful of NaN values drag every upper percentile to
    * NaN (and with it fences, medians, winsorize bounds). Nulled out
    * — `percentile` skips nulls — rather than row-filtered, so a
    * group that is entirely NaN still REACHES the aggregate and its
    * rows survive the row-preserving inner join-backs (with null
    * fences/medians, like an all-null group).
    */
  private def nanToNull(v: Column): Column = when(isnan(v), lit(null)).otherwise(v)

  private def joinBack(df: DataFrame, agg: DataFrame, groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) df.crossJoin(broadcast(agg))
    else {
      val renamed = groupCols.foldLeft(agg)((a, c) => a.withColumnRenamed(c, s"__jb_$c"))
      val cond = groupCols.map(c => col(c) <=> col(s"__jb_$c")).reduce(_ && _)
      df.join(Broadcasting.maybeBroadcast(renamed), cond)
        .drop(groupCols.map(c => s"__jb_$c"): _*)
    }

  /** Per-group Tukey fences: `(groupCols*, q1, q3, iqr, lo_fence,
    * hi_fence)` with fences at q1/q3 ∓ `k`·IQR. Null values are
    * ignored (percentile semantics).
    */
  def iqrFences(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    val v = nanToNull(col(valueCol).cast("double"))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        percentile(v, lit(0.25)).as("q1"),
        percentile(v, lit(0.75)).as("q3"))
      .select(
        groupCols.map(col) ++ Seq(
          col("q1"), col("q3"), (col("q3") - col("q1")).as("iqr"),
          (col("q1") - lit(k) * (col("q3") - col("q1"))).as("lo_fence"),
          (col("q3") + lit(k) * (col("q3") - col("q1"))).as("hi_fence")): _*)
  }

  /** Rows classified against their group's fences: input columns plus
    * `is_outlier`. The fence table is group-cardinality-sized —
    * broadcast when small (the common case).
    */
  def iqrOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    val fences = iqrFences(df, groupCols, valueCol, k)
      .select((groupCols.map(col) :+ col("lo_fence") :+ col("hi_fence")): _*)
    joinBack(df, fences, groupCols)
      .withColumn(
        "is_outlier",
        col(valueCol).isNotNull &&
          (col(valueCol) < col("lo_fence") || col(valueCol) > col("hi_fence")))
  }

  /** Per-group robust summary: fences plus outlier counts —
    * `(groupCols*, n, n_outliers, q1, q3, iqr, lo_fence, hi_fence)`.
    */
  def iqrSummary(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    val fences = iqrFences(df, groupCols, valueCol, k)
    joinBack(df, fences, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(col(valueCol)).as("n"),
        sum(when(
          col(valueCol).isNotNull &&
            (col(valueCol) < col("lo_fence") || col(valueCol) > col("hi_fence")),
          1L).otherwise(0L)).as("n_outliers"),
        first(col("q1")).as("q1"),
        first(col("q3")).as("q3"),
        first(col("iqr")).as("iqr"),
        first(col("lo_fence")).as("lo_fence"),
        first(col("hi_fence")).as("hi_fence"))
  }

  /** Per-group median absolute deviation: `(groupCols*, med, mad)` —
    * two exact-percentile passes (median, then median of absolute
    * deviations from it).
    */
  def mad(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val v = nanToNull(col(valueCol).cast("double"))
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.5)).as("med"))
    joinBack(df, med, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        first(col("med")).as("med"),
        percentile(abs(v - col("med")), lit(0.5)).as("mad"))
  }

  /** Rows with the value winsorized (clipped) to the group's
    * [pLo, pHi] exact percentiles: input columns plus `v_wins` and
    * `clipped` ∈ {-1, 0, 1} (below / kept / above). The same two-pass
    * shape as [[iqrOutliers]]: percentile bounds, broadcast join-back.
    */
  def winsorize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"winsorize: bad percentile band [$pLo, $pHi]")
    val v = col(valueCol).cast("double")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(
        percentile(nanToNull(v), lit(pLo)).as("w_lo"),
        percentile(nanToNull(v), lit(pHi)).as("w_hi"))
    // least/greatest SKIP nulls in both Spark and DuckDB — without the
    // explicit null guard a null value would "clip" to the lo fence.
    // NaN gets its own lane: least(greatest(NaN, lo), hi) evaluates to
    // hi under NaN-is-largest ordering, silently laundering a
    // non-value into the upper bound — NaN passes through un-clipped
    // with a null verdict instead (it is not comparable to the band).
    joinBack(df, bounds, groupCols)
      .withColumn(
        "v_wins",
        when(v.isNull || isnan(v), v)
          .otherwise(least(greatest(v, col("w_lo")), col("w_hi"))))
      .withColumn(
        "clipped",
        when(isnan(v), null)
          .when(v < col("w_lo"), -1).when(v > col("w_hi"), 1)
          .when(v.isNotNull, 0).otherwise(null))
  }

  /** Per-group winsorization report: bounds, clip counts and the
    * decimal-exact means before/after (rounded to 4 dp — the
    * [[graft.functions.CoreFunctions.davg]] portable contract).
    * Output: (groupCols*, n, n_lo, n_hi, w_lo, w_hi, mean_raw,
    * mean_wins).
    */
  def winsorizeSummary(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame =
    winsorize(df, groupCols, valueCol, pLo, pHi)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(col(valueCol)).as("n"),
        sum(when(col("clipped") === -1, 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("clipped") === 1, 1L).otherwise(0L)).as("n_hi"),
        first(col("w_lo")).as("w_lo"),
        first(col("w_hi")).as("w_hi"),
        graft.functions.CoreFunctions.davg(col(valueCol)).as("mean_raw"),
        graft.functions.CoreFunctions.davg(col("v_wins")).as("mean_wins"))

  /** Median imputation — the robust gap-filler of a feature pipeline:
    * null values take their GROUP's exact median (order statistics,
    * so one wild value cannot poison the fill the way a mean-fill
    * would). Input columns plus `<valueCol>_filled` and
    * `was_imputed`; groups that are entirely null stay null with
    * `was_imputed = false` (nothing defensible to fill with).
    * Two passes: group medians (group-cardinality-sized, broadcast),
    * join-back.
    */
  def imputeMedian(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(nanToNull(col(valueCol).cast("double")), lit(0.5)).as("__med"))
    joinBack(df, med, groupCols)
      .withColumn(
        s"${valueCol}_filled",
        coalesce(col(valueCol).cast("double"), col("__med")))
      .withColumn(
        "was_imputed",
        col(valueCol).isNull && col("__med").isNotNull)
      .drop("__med")
  }

  /** Exact LOWER weighted quantile per group: the smallest value
    * whose cumulative weight reaches q·W (W = total weight). No
    * interpolation — the result is always an observed value, so it
    * is portable across engines with no float interpolation
    * divergence. Weights are quantized to micro-units (the ewma
    * DECIMAL convention) and the reach test is pure integer
    * arithmetic: cumw·1e6 ≥ round(q·1e6)·W. (Integer bound: |W|·1e6
    * must fit a long — fine up to ~9e12 micro-weight per group;
    * beyond that, pre-aggregate per value first, which the operator
    * already does.)
    *
    * Shape: one (group, value) pre-aggregation collapses ties, then —
    * for NUMERIC values, whose distinct-value grain is row-sized in
    * the continuous case — a banded REACH plan rather than the full
    * `Stats.bandedCum` curve: a quantile needs one row per group (the
    * first to reach q·W), so after banding on the per-group bounds,
    * the per-BAND weight totals (≤ bands rows per group) locate the
    * single target band that contains the reach row, and only THAT
    * band's rows are shuffled and cum-summed — 1/bands of the
    * collapsed frame through the value-ordered exchange instead of
    * all of it (the r11 x141 fix: the full-curve window was the
    * surface's most expensive exchange two rounds running, computing
    * bands−1 bands' worth of cumulative sums the final reach filter
    * immediately discarded). Identical integer arithmetic, identical
    * result. A non-numeric (category) domain is bounded and keeps
    * the direct per-group window. Never a sort of the raw rows.
    * Output: (groupCols*, total_weight, wq_value).
    */
  def weightedQuantile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      q: Double = 0.5,
      bands: Int = 64): DataFrame = {
    require(q > 0 && q <= 1, s"weightedQuantile: q must be in (0,1], got $q")
    require(bands > 0, s"weightedQuantile: bands must be positive, got $bands")
    val qm = math.round(q * 1e6)
    val wu = col(weightCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
      .multiply(lit(10000)).cast("long")
    val gc = groupCols.map(col)
    // NaN values are excluded like nulls (no order statistic) — and
    // here a single NaN is also a PLAN hazard: it makes the group's
    // max bound NaN, every band expression NaN, and `least` (which
    // skips the null cast) then lands ALL rows in the last band —
    // the whole group back through one value-ordered exchange, the
    // exact single-task shape the banded reach exists to avoid.
    val vIsReal = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        !isnan(col(valueCol))
      case _ => lit(true)
    }
    val raw = df
      .filter(col(valueCol).isNotNull && vIsReal &&
        col(weightCol).isNotNull && col(weightCol) >= 0)
      .select(gc ++ Seq(col(valueCol).as("__v"), wu.as("__wu")): _*)
    val reached =
      if (df.schema(valueCol).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType]) {
        // --- banded reach (see scaladoc), straight off the RAW rows:
        // bounds and per-band weights are map-side-combinable
        // aggregates (≤ |groups| resp. ≤ bands·|groups| partials per
        // task), and a tie (same (group, value)) lands in one band by
        // construction, so the exactness-bearing tie collapse only
        // needs to run INSIDE the target band. No exchange in this
        // plan carries more than rows/bands rows — the (group, value)
        // pre-collapse exchange that used to feed the curve was the
        // whole frame wide (and near-useless on continuous values:
        // 594k distinct of 600k at sf0.1). Bounds/target joins follow
        // bandedCum's no-big-side-sort rule: broadcast while the
        // group-cardinality-sized small side fits, shuffled HASH join
        // past that.
        val W = org.apache.spark.sql.expressions.Window
        val boundAggs = Seq(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
          sum(col("__wu")).as("__tot"))
        var smallFits = false
        val withBounds =
          if (groupCols.isEmpty) {
            smallFits = true // 1 row, unconditionally
            raw.crossJoin(broadcast(raw.agg(boundAggs.head, boundAggs.tail: _*)))
          } else {
            val bounds = raw.groupBy(gc: _*)
              .agg(boundAggs.head, boundAggs.tail: _*)
              .select(groupCols.map(c => col(c).as(s"__bg_$c")) ++
                Seq(col("__lo"), col("__hi"), col("__tot")): _*)
            smallFits = Broadcasting.fitsBroadcast(bounds)
            raw.join(
                if (smallFits) broadcast(bounds) else bounds.hint("shuffle_hash"),
                groupCols.map(c => col(c) <=> col(s"__bg_$c")).reduce(_ && _))
              .drop(groupCols.map(c => s"__bg_$c"): _*)
          }
        val banded = withBounds
          .withColumn(
            "__bkt",
            when(col("__hi") === col("__lo"), lit(0))
              .otherwise(least(
                lit(bands - 1),
                floor((col("__v") - col("__lo")).cast("double") /
                  ((col("__hi") - col("__lo")).cast("double") / lit(bands))).cast("int"))))
          .drop("__lo", "__hi")
        // per-band weight totals: ≤ bands rows per group
        val bandW = banded.groupBy(gc :+ col("__bkt"): _*)
          .agg(sum(col("__wu")).as("__bw"), max(col("__tot")).as("__bt"))
        // the first band whose INCLUSIVE cumulative reaches q·W holds
        // the reach row; its EXCLUSIVE cumulative seeds the in-band
        // cumsum. min(struct) picks that band without a second window.
        val cumW = W.partitionBy(gc: _*).orderBy(col("__bkt"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        val tgt = bandW
          .withColumn("__cumb", sum(col("__bw")).over(cumW))
          .filter(col("__cumb") * lit(1000000L) >= lit(qm) * col("__bt"))
          .groupBy(gc: _*)
          .agg(min(struct(
            col("__bkt").as("b"), (col("__cumb") - col("__bw")).as("off"))).as("__m"))
          .select(groupCols.map(c => col(c).as(s"__tg_$c")) ++
            Seq(col("__m").getField("b").as("__tb"),
              col("__m").getField("off").as("__toff")): _*)
        // only the target band's rows reach the tie collapse + the
        // value-ordered exchange: rows/bands of the input
        val inBand = banded.join(
            if (smallFits) broadcast(tgt) else tgt.hint("shuffle_hash"),
            (groupCols.map(c => col(c) <=> col(s"__tg_$c")) :+
              (col("__bkt") === col("__tb"))).reduce(_ && _))
          .drop(groupCols.map(c => s"__tg_$c"): _*)
        val collapsedIn = inBand
          .groupBy(gc ++ Seq(col("__v"), col("__bkt")): _*)
          .agg(sum(col("__wu")).as("__w"),
            max(col("__toff")).as("__toff"), max(col("__tot")).as("__tot"))
        val wb = W.partitionBy(gc :+ col("__bkt"): _*).orderBy(col("__v"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        collapsedIn.withColumn("__cum", col("__toff") + sum(col("__w")).over(wb))
      } else {
        val collapsed = raw
          .groupBy(gc :+ col("__v"): _*)
          .agg(sum(col("__wu")).as("__w"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*).orderBy(col("__v"))
        val tot = org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)
        collapsed
          .withColumn("__cum", sum(col("__w")).over(win))
          .withColumn("__tot", sum(col("__w")).over(tot))
      }
    reached
      .filter(col("__cum") * lit(1000000L) >= lit(qm) * col("__tot"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        (first(col("__tot")).cast("double") / lit(1e4)).as("total_weight"),
        min(col("__v")).as("wq_value"))
  }
}
