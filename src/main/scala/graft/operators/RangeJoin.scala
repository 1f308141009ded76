package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — Spark has no native range join
  * operator, and a raw inequality condition degenerates to a
  * nested-loop. Bucketization turns it into an equi-join: intervals
  * explode over the time chunks they cover, points map to their single
  * chunk, the join runs on (key, chunk), and the exact BETWEEN filter
  * finishes. A point's chunk intersects every covering interval
  * exactly once, so no dedup is needed. Shuffle volume is
  * |points| + Σ interval_chunks — linear for intervals bounded by a
  * few chunks; pick `chunkSeconds` near the typical interval length.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointTs: String,
      startTs: String,
      endTs: String,
      chunkSeconds: Long = 1800L): DataFrame = {
    // chunkSeconds = 0 made `div 0` a silent NULL chunk on both sides
    // (ANSI off) — the equi-join matched nothing and returned an empty
    // frame with no error; the µs bound is the Resample guard
    require(chunkSeconds > 0, s"pointInInterval: chunkSeconds must be positive, got $chunkSeconds")
    require(chunkSeconds <= Long.MaxValue / 1000000L,
      s"pointInInterval: chunkSeconds=$chunkSeconds overflows microseconds")
    require(!points.columns.contains("__chunk") && !intervals.columns.contains("__chunk"),
      "pointInInterval: inputs must not carry a __chunk column (it would be overwritten)")
    val us = chunkSeconds * 1000000L
    // integer `div` on both sides — double division could truncate a
    // boundary chunk differently on the two sides and drop a match
    val p = points.withColumn("__chunk", expr(s"unix_micros($pointTs) div $us"))
    val iv = intervals
      // degenerate intervals dropped BEFORE the explode: they can
      // never satisfy the BETWEEN anyway, and Spark's sequence(a, b)
      // defaults to step −1 when a > b — one corrupt inverted interval
      // (end = epoch-0 sentinel, start = today) would explode into
      // ~10⁶ descending chunk rows that the final filter discards
      .filter(col(startTs).isNotNull && col(endTs).isNotNull &&
        col(endTs) >= col(startTs))
      .withColumn(
        "__chunk",
        explode(expr(s"sequence(unix_micros($startTs) div $us, unix_micros($endTs) div $us)")))
    p.join(iv, Seq(key, "__chunk"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__chunk")
  }
}
