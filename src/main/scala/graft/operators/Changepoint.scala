package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection per key (Page 1954, public) — "where
  * did this metric's level shift?" over an ordered value stream.
  *
  * The classic statistic S_i = Σ_{j≤i}(y_j − ȳ) peaks at the shift
  * point; computing it portably means avoiding the float mean, so the
  * statistic is kept SCALED: with P_i the integer prefix sum of 1e-4
  * quantized values, T the key's total and n the key's count,
  * n·S_i = n·P_i − i·T — exact integers end to end. The argmax over
  * |n·S_i| (tie → earliest i) is therefore bit-deterministic, and
  * only the reported magnitude divides back to value units (one
  * double division chain).
  *
  * Shape: one window pass for (i, P_i) per key, a key-sized aggregate
  * (n, T) broadcast back, and a partial-aggregated struct argmax —
  * one shuffle for the sort, one for the argmax; nothing corpus-sized
  * crosses the driver.
  */
object Changepoint {

  /** Per-key CUSUM peak. Output: keyCols*, n, cp_id (the `idCol` at
    * the peak — the LAST row of the pre-shift segment), cp_ts, cp_i
    * (1-based position), shift (mean after − mean before, value
    * units, null for degenerate splits), cusum (peak |S_i| in value
    * units).
    */
  def cusum(
      df: DataFrame, keyCols: Seq[String], tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vd = col(valueCol).cast("double")
    val dec = col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
    // Stats.quantizable contract: NaN excluded like null, a finite
    // value outside DECIMAL(18,4) RAISES — it previously quantized to
    // a null yu that row_number i still counted while the prefix sum p
    // skipped, silently corrupting n·S_i with no signal
    val yu = coalesce(
      assert_true(dec.isNotNull,
        concat(lit("cusum: value outside the DECIMAL(18,4) quantization domain: "),
          vd.cast("string"))).cast("long"),
      (dec * lit(10000).cast(org.apache.spark.sql.types.DecimalType(5, 0))).cast("long"))
    val rows = df
      // null keys excluded explicitly (the Resample convention): the
      // totals equi-join below is non-null-safe, so a null-key group
      // would be aggregated and then silently dropped at the join
      .filter(keyCols.map(col(_).isNotNull)
        .fold(col(tsCol).isNotNull && vd.isNotNull && !isnan(vd))(_ && _))
      .select(keyCols.map(col) ++ Seq(col(tsCol), col(idCol), yu.as("yu")): _*)
      .select(
        keyCols.map(col) ++ Seq(
          col(tsCol), col(idCol),
          row_number().over(w).cast("long").as("i"),
          // DECIMAL prefix sums: n·P must survive corpus-scale keys
          // (long n·P overflows int64 already at ~10⁶ rows of 10³
          // values; DuckDB's HUGEINT mirrors the exactness)
          sum(col("yu").cast(org.apache.spark.sql.types.DecimalType(28, 0)))
            .over(frame).as("p")): _*)
    val totals = rows
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("i")).as("n"), max_by(col("p"), col("i")).as("t"))
    // n·S_i = n·P_i − i·T, exact; peak by (|nS| desc, i asc) as ONE
    // mergeable struct max — ≤1 struct per (key, partition) shuffles.
    val joined = rows
      .join(Broadcasting.maybeBroadcast(totals), keyCols)
      .withColumn("ns", col("n") * col("p") - col("i") * col("t"))
    val peak = joined
      .groupBy(keyCols.map(col): _*)
      .agg(
        first(col("n")).as("n"),
        first(col("t")).as("t"),
        max(struct(
          abs(col("ns")).as("a"),
          (-col("i")).as("ni"),
          col("i").as("i"),
          col(idCol).as("id"),
          col(tsCol).as("ts"),
          col("ns").as("ns"),
          col("p").as("p"))).as("pk"))
    peak.select(
      keyCols.map(col) ++ Seq(
        col("n"),
        col("pk.id").as("cp_id"),
        col("pk.ts").as("cp_ts"),
        col("pk.i").as("cp_i"),
        // mean after − mean before, value units; degenerate when the
        // peak sits at the last row (no "after" segment)
        when(col("pk.i") === col("n"), null)
          .otherwise(
            (((col("t") - col("pk.p")).cast("double") / (col("n") - col("pk.i")).cast("double")) -
              (col("pk.p").cast("double") / col("pk.i").cast("double"))) / lit(10000.0))
          .as("shift"),
        ((abs(col("pk.ns")).cast("double") / col("n").cast("double")) / lit(10000.0))
          .as("cusum")): _*)
  }
}
