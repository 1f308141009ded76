package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Conditional broadcast hints shared by the operator layer. */
private[graft] object Broadcasting {

  /** Broadcast `df` only while its optimizer-estimated size fits the
    * session broadcast threshold. A forced `broadcast()` hint bypasses
    * the planner's size guard entirely — on a side that is only
    * "small by construction" under assumptions (an external query set,
    * a capped-out hot-gram list with an aggressive cap), that is a
    * driver OOM waiting for the assumption to break. Past the
    * threshold the unhinted plan degrades to a shuffled join.
    */
  def maybeBroadcast(df: DataFrame): DataFrame =
    if (fitsBroadcast(df)) broadcast(df) else df

  /** The session's broadcast threshold in bytes (−1 = disabled). */
  def threshold(df: DataFrame): Long = {
    val confStr = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    if (confStr.startsWith("-")) -1L
    else scala.util.Try(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(confStr)).getOrElse(-1L)
  }

  /** Does `df` fit the broadcast threshold by the optimizer's own size
    * estimate? Callers use this to decide for a frame whose OWN stats
    * are useless (aggregates over joins over windows estimate as if
    * nothing reduced) from a PROXY frame with a provable size
    * relationship — e.g. bandedCum's offset table has at most as many
    * rows as its bounds frame's (never-shrinking) estimate, so
    * `fitsBroadcast(bounds)` soundly bounds it.
    */
  def fitsBroadcast(df: DataFrame): Boolean = {
    val thr = threshold(df)
    thr > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
  }
}
