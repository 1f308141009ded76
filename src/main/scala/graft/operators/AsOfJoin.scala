package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the payload of the
  * latest right row with the same key and `rightTs <= leftTs` —
  * time-series enrichment Spark has no native operator for.
  *
  * Realized with existing operators (SURVEY §4.3 preference (a)):
  * union the tagged sides, one shuffle on the key, one sort by
  * (ts, side), and a running `last(_, ignoreNulls)` carries the most
  * recent right payload forward into each left row. That is the
  * merge-join formulation: no range-condition pair explosion, state is
  * a single row per key during the sort — at 100 TB it scales exactly
  * like any sort-merge join on the key. Right rows sort before left
  * rows at equal timestamps, giving `<=` (inclusive) semantics.
  *
  * The right side must be unique per (key, ts) — pre-dedup it
  * (deterministically) or ties make "latest" ambiguous.
  */
object AsOfJoin {

  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String],
      suffix: String = "_asof"): DataFrame = {

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      .select((key +: rightTs +: payloadCols).map(col): _*)
      .withColumnRenamed(rightTs, "__rts")
      .withColumn("__ts", col("__rts"))
      .withColumn("__side", lit(0))

    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payloadCols.foldLeft(unioned) { (df, p) =>
      df.withColumn(p + suffix, last(col(p), ignoreNulls = true).over(w))
    }.withColumn(rightTs + suffix, last(col("__rts"), ignoreNulls = true).over(w))

    filled
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__rts")
      .drop(payloadCols: _*)
  }
}
