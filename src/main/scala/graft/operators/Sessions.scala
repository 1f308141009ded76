package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream shape
  * (user_id, event_id, ts): a new session starts after `gapMinutes` of
  * inactivity. One shuffle on user_id, one sort by (ts, event_id) —
  * the lag/flag/running-sum composition; scales like any windowed
  * aggregation partitioned by user.
  */
object Sessions {

  /** Per-event session labels: the input rows (user_id, event_id, ts,
    * + any extra columns listed in `carry`) plus `session_id` — the
    * lag/flag/running-sum chain shared with [[sessions]].
    */
  def labeled(events: DataFrame, gapMinutes: Int = 30, carry: Seq[String] = Seq.empty): DataFrame = {
    // a non-positive gap silently degrades to one-session-per-event —
    // fail loudly like every sibling's parameter require
    require(gapMinutes > 0, s"Sessions: gapMinutes must be positive, got $gapMinutes")
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    events
      // null ts has no position in the ordered stream (each such row
      // fabricated its own degenerate session and shifted every real
      // session_id); null user_id merges unrelated users into one
      // phantom window partition — both excluded, the ewma convention
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(
        Seq(col("user_id"), col("event_id"), col("ts")) ++ carry.map(col) :+
          when(lag(col("ts"), 1).over(w).isNull || gapUs > lit(gapMinutes * 60L * 1000000L), 1)
            .otherwise(0).as("ns"): _*)
      .withColumn("session_id", sum(col("ns")).over(frame).cast("int"))
      .drop("ns")
  }

  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    labeled(events, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).cast("double") / 1e6)
          .as("duration_s"))
}
