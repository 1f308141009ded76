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
    val us = chunkSeconds * 1000000L
    // integer `div` on both sides — double division could truncate a
    // boundary chunk differently on the two sides and drop a match
    val p = points.withColumn("__chunk", expr(s"unix_micros($pointTs) div $us"))
    val iv = intervals.withColumn(
      "__chunk",
      explode(expr(s"sequence(unix_micros($startTs) div $us, unix_micros($endTs) div $us)")))
    p.join(iv, Seq(key, "__chunk"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__chunk")
  }
}
