package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal-baseline anomaly screening: model each metric's expected
  * value by its HOUR-OF-WEEK slot (the dominant seasonality of
  * product/ops metrics) with the median, and flag points further
  * than `k` robust sigmas (MAD) from their slot's baseline — the
  * classic model-free outage/fraud screen (Leys et al. 2013 on MAD
  * cutoffs; public).
  *
  * Medians are exact (`percentile`, not approx) over MICRO-UNIT
  * integers (`value` through DECIMAL(18,4) ×10⁴ — the x112/ewma
  * convention): an exact median of integers is integer- or
  * half-integer-valued, a MAD of those is quarter-integer-valued —
  * all exactly representable doubles, so engine and oracle agree
  * bit-for-bit with no rounding step.
  *
  * Scale shape: two aggregations on the same (type, dow, hour) key —
  * slots are bounded (|types|·168), so the second pass joins against
  * a broadcastable baseline table. Day-of-week is ISO (1 = Monday)
  * in both engines (`weekday()+1` here, `isodow` there).
  */
object Seasonal {

  /** Per-slot robust baseline + anomaly counts: `(event_type, isodow,
    * hour, n, med, mad, n_anomalies, n_exceed_exact)` with med/mad in
    * original value units (micro-exact doubles).
    *
    * DEGENERATE-SLOT CONTRACT: a slot where ≥50 % of values equal the
    * median has MAD = 0, and the `mad_u > 0` guard then flags NOTHING
    * via `n_anomalies` no matter how extreme a point is — MAD carries
    * no scale information there (Leys et al. discuss the degenerate
    * case). The SECONDARY SCREEN covers exactly that blind spot:
    * `n_exceed_exact` counts, FOR mad=0 SLOTS ONLY, the values
    * strictly different from the median — at mad=0 the k·MAD cutoff
    * is 0, so any inequality is an exceedance — making a flat-lined
    * heartbeat metric with one wild point visible in the same output
    * row (`mad = 0.0, n_anomalies = 0, n_exceed_exact ≥ 1`) without a
    * caller-side second pass. For mad>0 slots the MAD screen is
    * authoritative and `n_exceed_exact` is 0 by definition (not
    * computed), so healthy non-degenerate slots stay visually quiet.
    */
  def hourOfWeekAnomalies(
      events: DataFrame,
      k: Double = 4.0,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(k > 0, s"hourOfWeekAnomalies: k must be positive, got $k")
    // Stats.quantizable: NaN excluded like null, a finite value
    // outside the DECIMAL(18,4) domain RAISES — it previously
    // quantized to a NULL vu silently, so the most extreme points
    // (the very anomalies this screen exists to catch) dropped out of
    // the median AND the anomaly count while n still counted them
    val slotted = Stats.quantizable(events, valueCol, "hourOfWeekAnomalies")
      // null ts (or type) would form a slot whose median is computed
      // and then discarded by the equi-joins — exclude both
      // explicitly (the Resample convention) instead of paying dead
      // percentile aggregations
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(
        col(typeCol).as("event_type"),
        (weekday(col(tsCol)) + lit(1)).cast("int").as("isodow"),
        hour(col(tsCol)).cast("int").as("hour"),
        col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .multiply(lit(10000)).cast("long").as("vu"))
    val keys = Seq("event_type", "isodow", "hour")
    // ONE scan of events (r14, second step): collapse to the
    // (slot, value) grain first — percentile's partial state is the
    // value→count map anyway, so this exchange carries the same
    // content the raw-row median's partial buffers carried — and run
    // BOTH the median (percentile's exact FREQUENCY form, the same
    // expand-each-value-cnt-times statistic bit-for-bit) and the
    // deviation table off that grain. The previous shape scanned
    // events once for the median and AGAIN under the broadcast med
    // join (a broadcast join keeps the streamed side un-exchanged, so
    // exchange reuse had nothing to dedupe): 2 full scans → 1.
    val vals = slotted
      .groupBy(keys.map(col) :+ col("vu"): _*)
      .agg(count(lit(1)).as("__cv"))
    val med = vals
      .groupBy(keys.map(col): _*)
      .agg(expr("percentile(vu, 0.5, __cv)").as("med_u"))
    // Tie-collapsed deviation table (r14): both the MAD and every
    // anomaly/exceedance count are functions of |vu − med| ALONE, so
    // the later passes run over the (slot, deviation) grain. The two
    // consumers (the MAD aggregate, the final counts) reuse the one
    // devs exchange. Deviations are integer- or half-integer-valued
    // micro-units (see the MAD note above), so grouping on the double
    // is exact, and `__dev ≠ 0 ⟺ vu ≠ med_u` keeps the
    // degenerate-slot screen identical.
    val devs = vals.join(Broadcasting.maybeBroadcast(med), keys)
      .groupBy(keys.map(col) ++ Seq(
        col("med_u"), abs(col("vu") - col("med_u")).as("__dev")): _*)
      .agg(sum(col("__cv")).as("__c"))
    val mad = devs
      .groupBy(keys.map(col): _*)
      .agg(expr("percentile(__dev, 0.5, __c)").as("mad_u"))
    devs
      .join(Broadcasting.maybeBroadcast(mad), keys)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__c")).as("n"),
        (first(col("med_u")) / lit(10000.0)).as("med"),
        (first(col("mad_u")) / lit(10000.0)).as("mad"),
        sum(when(
          col("__dev") > lit(k) * col("mad_u") && col("mad_u") > 0,
          col("__c")).otherwise(0L)).as("n_anomalies"),
        // degenerate-slot secondary screen: exact inequality against
        // the median, counted only where MAD carries no scale (mad=0).
        // vu and med_u are exact integers when mad can be 0 (a
        // half-integer median implies the two middle values differ,
        // which already forces mad ≥ 0.25), so `__dev ≠ 0` is an exact
        // comparison — bit-portable like the rest of the row.
        sum(when(col("mad_u") === 0 && col("__dev") =!= 0.0, col("__c"))
          .otherwise(0L)).as("n_exceed_exact"))
  }
}
