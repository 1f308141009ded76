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

  /** Per-group Pearson r² between two measures, both quantized to
    * exact integer 1e-4 units (r² is scale invariant, so no
    * unscaling). Output: groupCols*, n, r2.
    */
  def pearsonR2(
      df: DataFrame, groupCols: Seq[String], xCol: String, yCol: String): DataFrame =
    fits(moments(df, groupCols, toUnits(col(xCol)), toUnits(col(yCol))))
      .select(groupCols.map(col) ++ Seq(col("n"), col("r2")): _*)
}
