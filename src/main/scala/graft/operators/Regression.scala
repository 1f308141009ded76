package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group simple linear regression (OLS trend) and Pearson
  * correlation — the drift/association probes of a metrics warehouse
  * ("is this KPI trending?", "do these measures move together?").
  *
  * Scale + portability shape: everything reduces to the five moment
  * sums (Σx, Σy, Σx², Σxy, Σy²) computed in ONE aggregation pass —
  * map-side combinable, one shuffle, no window, no second scan except
  * the per-group epoch baseline for [[trend]] (an aggregate joined
  * back, vocabulary-sized). Both operands are quantized to exact
  * INTEGER decimals first (x: relative seconds; y: 1e-4 units via
  * DECIMAL(18,4)·10⁴), so every term and every sum is an exact
  * integer — partial aggregation order cannot change a bit, and the
  * final integer→double casts are correctly rounded in every engine.
  * (A fractional-scaled decimal would NOT survive the cast: DuckDB
  * converts DECIMAL(p,4)→DOUBLE by dividing in double space, which is
  * one ulp off the correctly-rounded value for wide sums — measured on
  * this corpus. Integer decimals sidestep the whole class.) The
  * closed forms then run in double arithmetic over identical
  * expression trees, so two engines computing from the same exact
  * sums agree bit-for-bit.
  */
object Regression {

  private val D = DecimalType(18, 4)
  // (19,0) integer operands: 19+19 = 38 keeps every product inside
  // both engines' decimal-multiply width limit, with int128 physical
  // arithmetic (DuckDB computes DECIMAL(18,·) products in int64 and
  // overflows on corpus-scale squares).
  private val DI = DecimalType(19, 0)

  /** Exact integer 1e-4 units of any numeric column: DECIMAL(18,4)
    * quantization then ·10⁴ — every step exact.
    */
  def toUnits(c: Column): Column =
    (c.cast(D) * lit(10000).cast(DecimalType(5, 0))).cast(DI)

  /** Exact (x, y) moment sums per group; both inputs must be
    * integer-valued decimal Columns (see [[toUnits]]). Output:
    * groupCols*, n, sx, sy, sxx, sxy, syy — exact integer sums cast
    * to double at the very end.
    */
  def moments(
      df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    val xd = x.cast(DI)
    val yd = y.cast(DI)
    df
      .filter(x.isNotNull && y.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).cast("double").as("sx"),
        sum(yd).cast("double").as("sy"),
        sum((xd * xd).cast(DecimalType(38, 0))).cast("double").as("sxx"),
        sum((xd * yd).cast(DecimalType(38, 0))).cast("double").as("sxy"),
        sum((yd * yd).cast(DecimalType(38, 0))).cast("double").as("syy"))
  }

  /** The shared closed forms over a moments frame: slope, intercept
    * (at x = 0) and r² in the QUANTIZED units (caller unscales) —
    * doubles, guarded against zero variance.
    */
  private def fits(m: DataFrame): DataFrame = {
    val n = col("n").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val varX = n * col("sxx") - col("sx") * col("sx")
    val varY = n * col("syy") - col("sy") * col("sy")
    m.select(
      m.columns.map(col) ++ Seq(
        when(varX === 0.0, null).otherwise(cov / varX).as("slope_u"),
        when(varX === 0.0, null)
          .otherwise((col("sy") - (cov / varX) * col("sx")) / n).as("intercept_u"),
        when(varX === 0.0 || varY === 0.0, null)
          .otherwise((cov * cov) / (varX * varY)).as("r2")): _*)
  }

  /** Per-group time trend of a measure: OLS of y over event-time
    * seconds RELATIVE TO THE GROUP'S FIRST EVENT (slope is shift
    * invariant; the relative origin keeps every product inside exact
    * decimal range at any corpus age). Output: groupCols*, n,
    * slope_per_day (measure units per 24 h), intercept (fitted value
    * at the group's first event), r2.
    */
  def trend(
      df: DataFrame, groupCols: Seq[String], tsCol: String, valueCol: String): DataFrame = {
    // Floor-division micros → seconds (the Resample idiom — exact for
    // either epoch sign), then the per-group baseline joined back.
    val sec = expr(
      s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), 1000000L)) div 1000000L")
    val based = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ sec.as("sec") :+ col(valueCol).as("y"): _*)
    val base = based.groupBy(groupCols.map(col): _*).agg(min(col("sec")).as("sec0"))
    val rel = based
      .join(Broadcasting.maybeBroadcast(base), groupCols)
      .select(
        groupCols.map(col) :+ (col("sec") - col("sec0")).as("x") :+ toUnits(col("y")).as("yu"): _*)
    fits(moments(rel, groupCols, col("x").cast(DI), col("yu")))
      .select(
        groupCols.map(col) ++ Seq(
          col("n"),
          ((col("slope_u") * lit(86400.0)) / lit(10000.0)).as("slope_per_day"),
          (col("intercept_u") / lit(10000.0)).as("intercept"),
          col("r2")): _*)
  }

  /** Per-group autocorrelation function r_l for lags 1..`maxLag` over
    * the series of `valueCol` ordered by (tsCol, idCol) — the "is
    * this metric self-similar / periodic?" probe (flat ACF ⇒ noise;
    * slow decay ⇒ trend; spikes at lag k ⇒ period k). The standard
    * estimator r_l = Σ_{t≤n−l}(x_t−x̄)(x_{t+l}−x̄) / Σ(x_t−x̄)², with
    * x̄ the full-series mean.
    *
    * Exactness: one window pass materializes lead(u, l) for every lag
    * (u = exact 1e-4 units); ONE aggregation then collects n, Σu, Σu²
    * and the per-lag pair sums (m_l, Σu_t·u_{t+l}, Σu_t, Σu_{t+l}) —
    * all exact integers (DECIMAL(38,0) partials). The closed form
    * num_l = C_l − x̄(A_l+B_l) + m_l·x̄² over den = Q − S²/n runs in
    * identical double trees on both engines. Lags unpack from one
    * struct array — the aggregate subtree is never duplicated.
    *
    * Scale note: the window sorts each GROUP's series in one task —
    * the same per-key contract as [[Resample]] (bounded series per
    * key); shard long series by a coarser group first.
    * Output: (groupCols*, lag, n, m_pairs, acf).
    */
  def acf(
      df: DataFrame, groupCols: Seq[String], tsCol: String, idCol: String,
      valueCol: String, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"acf: maxLag=$maxLag out of [1, 64]")
    val D38 = DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    val base = df
      .filter(col(valueCol).isNotNull)
      .select(
        groupCols.map(col) ++ Seq(col(tsCol), col(idCol), toUnits(col(valueCol)).as("__u")): _*)
    val withLeads = base.select(
      groupCols.map(col) ++ Seq(col("__u")) ++
        (1 to maxLag).map(l => lead(col("__u"), l).over(w).as(s"__l$l")): _*)
    val lagAggs = (1 to maxLag).flatMap { l =>
      val ld = col(s"__l$l")
      Seq(
        count(ld).as(s"__m$l"),
        sum((col("__u") * ld).cast(D38)).cast("double").as(s"__c$l"),
        sum(when(ld.isNotNull, col("__u"))).cast("double").as(s"__a$l"),
        sum(ld).cast("double").as(s"__b$l"))
    }
    val aggs = Seq(
      count(lit(1)).as("__n"),
      sum(col("__u")).cast("double").as("__s"),
      sum((col("__u") * col("__u")).cast(D38)).cast("double").as("__q")) ++ lagAggs
    val agg = withLeads.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val lagRows = array((1 to maxLag).map(l => struct(
      lit(l).as("lag"), col(s"__m$l").as("m"),
      col(s"__c$l").as("c"), col(s"__a$l").as("a"), col(s"__b$l").as("b"))): _*)
    val xbar = col("__s") / col("__n").cast("double")
    val den = col("__q") - col("__s") * col("__s") / col("__n").cast("double")
    val num = col("__L.c") - xbar * (col("__L.a") + col("__L.b")) +
      col("__L.m").cast("double") * xbar * xbar
    agg
      .select(
        groupCols.map(col) ++ Seq(
          col("__n"), col("__s"), col("__q"), explode(lagRows).as("__L")): _*)
      .select(
        groupCols.map(col) ++ Seq(
          col("__L.lag").as("lag"), col("__n").as("n"), col("__L.m").as("m_pairs"),
          when(den === 0.0 || col("__L.m") === 0, null).otherwise(num / den).as("acf")): _*)
  }

  /** Per-group Pearson r² between two measures, both quantized to
    * exact integer 1e-4 units (r² is scale invariant, so no
    * unscaling). Output: groupCols*, n, r2.
    */
  def pearsonR2(
      df: DataFrame, groupCols: Seq[String], xCol: String, yCol: String): DataFrame =
    fits(moments(df, groupCols, toUnits(col(xCol)), toUnits(col(yCol))))
      .select(groupCols.map(col) ++ Seq(col("n"), col("r2")): _*)

  /** Rolling Pearson correlation between two ALIGNED series (one row
    * per `ordCol` tick, both values integer-quantized by the caller):
    * over the trailing `window` rows, exact integer moment sums
    * (Σx, Σy, Σx², Σy², Σxy) in one frame pass, then the textbook
    * r = (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) on a single double
    * tree. Rows earlier than `window−1` ticks report null (incomplete
    * frame); a zero-variance frame reports null (r undefined).
    * The window partitions by `groupCols` — pass a bounded-domain
    * series (e.g. hourly buckets) per group; the frame is
    * domain-sized, never raw-row-sized.
    * Output: (groupCols*, ordCol, n, r).
    */
  def rollingCorr(
      df: DataFrame,
      groupCols: Seq[String],
      ordCol: String,
      xCol: String,
      yCol: String,
      window: Int): DataFrame = {
    require(window >= 2 && window <= 100000, s"rollingCorr: window=$window out of [2, 1e5]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(ordCol).asc)
      .rowsBetween(-(window - 1), 0)
    // Products and frame sums in DECIMAL(38,0) (the moments/acf
    // widths): a long x·x wraps past |x| ~3e9 — quantized values a
    // billion-row metric easily reaches — and under ANSI the wrap is
    // a job-killing overflow instead; 38-digit partials stay exact to
    // |x| ~1e16 at the 1e5 frame cap and the closed form reads them
    // as doubles exactly as before.
    val D38 = DecimalType(38, 0)
    val x = col(xCol).cast("long").cast(DI)
    val y = col(yCol).cast("long").cast(DI)
    val n = count(lit(1)).over(w)
    val sx = sum(x).over(w)
    val sy = sum(y).over(w)
    val sxx = sum((x * x).cast(D38)).over(w)
    val syy = sum((y * y).cast(D38)).over(w)
    val sxy = sum((x * y).cast(D38)).over(w)
    val nd = col("__n").cast("double")
    val num = nd * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")
    val vx = nd * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val vy = nd * col("__syy").cast("double") -
      col("__sy").cast("double") * col("__sy").cast("double")
    df
      .select(groupCols.map(col) ++ Seq(
        col(ordCol),
        n.as("__n"), sx.as("__sx"), sy.as("__sy"),
        sxx.as("__sxx"), syy.as("__syy"), sxy.as("__sxy")): _*)
      .select(groupCols.map(col) ++ Seq(
        col(ordCol),
        col("__n").as("n"),
        when(col("__n") === window && vx > 0 && vy > 0,
          round(num / sqrt(vx * vy), 6)).as("r")): _*)
  }
}
