package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OHLC bars + time-weighted average per (key, time bucket) — the
  * candlestick/metrics-rollup aggregation of a tick stream.
  *
  * Portability: open/close are picked by ONE row_number window (total
  * order (ts, id) — no first/last nondeterminism), high/low are plain
  * extrema (no arithmetic), and TWAP is exact to the last bit before
  * a single double division: values in integer 1e-4 units, weights in
  * integer microseconds (each sample extends to the next sample in
  * the SAME bucket, the bucket's last sample to the bucket end), the
  * Σ(value·weight) accumulated in DECIMAL(38,0).
  *
  * One shuffle + one per-key-bucket sort (the shared window), then a
  * map-side-combinable aggregate. Buckets are floor-division epochs
  * (the [[Resample]] idiom — exact for either epoch sign).
  */
object Bars {

  /** Output: keyCols*, bucket (long), bucket_start (ts), n, open,
    * high, low, close, twap.
    */
  def ohlcBars(
      df: DataFrame, keyCols: Seq[String], tsCol: String, idCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"ohlcBars: bucket must be positive, got $bucketSeconds")
    // the µs conversion must not wrap (the Resample guard): a step past
    // Long.MaxValue/1e6 goes negative silently with ANSI off, and
    // bucket arithmetic on a negative modulus produces garbage bars
    require(bucketSeconds <= Long.MaxValue / 1000000L,
      s"ohlcBars: bucketSeconds=$bucketSeconds overflows microseconds")
    val stepUs = bucketSeconds * 1000000L
    val bucketExpr = expr(
      s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${stepUs}L)) div ${stepUs}L")
    val vd = col(valueCol).cast("double")
    val dec = col(valueCol).cast(DecimalType(18, 4))
    // Stats.quantizable contract: NaN excluded like null (it also
    // poisons high/low under NaN-is-largest ordering), a finite value
    // outside DECIMAL(18,4) RAISES — it previously quantized to a null
    // __yu whose term dropped out of Σ(value·weight) while its weight
    // still entered Σ(weight), silently biasing twap low
    val yu = coalesce(
      assert_true(dec.isNotNull,
        concat(lit("ohlcBars: value outside the DECIMAL(18,4) quantization domain: "),
          vd.cast("string"))).cast("long"),
      (dec * lit(10000).cast(DecimalType(5, 0))).cast("long"))
    val rows = df
      .filter(col(tsCol).isNotNull && vd.isNotNull && !isnan(vd))
      .select(
        keyCols.map(col) ++ Seq(
          bucketExpr.as("bucket"), col(tsCol).as("__ts"), col(idCol).as("__id"),
          col(valueCol).as("__v"), yu.as("__yu")): _*)
    val grp = keyCols.map(col) :+ col("bucket")
    val wAsc = Window.partitionBy(grp: _*).orderBy(col("__ts").asc, col("__id").asc)
    val bucketEndUs = (col("bucket") + 1) * lit(stepUs)
    val nextUs = lead(unix_micros(col("__ts")), 1).over(wAsc)
    val weightUs = coalesce(nextUs, bucketEndUs) - unix_micros(col("__ts"))
    val marked = rows.select(
      (grp ++ Seq(
        col("__v"), col("__yu"),
        row_number().over(wAsc).as("__ra"),
        // partition row count from the SAME ascending window (full
        // frame) — the old descending row_number forced a second
        // per-(key,bucket) sort with opposite order just to mark the
        // last row; close = (__ra == __n) needs only this one sort
        count(lit(1)).over(wAsc.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("__n"),
        weightUs.as("__w"))): _*)
    marked
      .groupBy(grp: _*)
      .agg(
        count(lit(1)).as("n"),
        max(when(col("__ra") === 1, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(when(col("__ra") === col("__n"), col("__v"))).as("close"),
        sum((col("__yu").cast(DecimalType(19, 0)) * col("__w").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0))).as("__num"),
        sum(col("__w").cast(DecimalType(28, 0))).as("__den"))
      .select(
        (keyCols.map(col) ++ Seq(
          col("bucket"),
          timestamp_micros(col("bucket") * lit(stepUs)).as("bucket_start"),
          col("n"), col("open"), col("high"), col("low"), col("close"),
          when(col("__den") === 0, null)
            .otherwise(
              (col("__num").cast("double") / col("__den").cast("double")) / lit(10000.0))
            .as("twap"))): _*)
  }
}
