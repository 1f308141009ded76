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
  def maybeBroadcast(df: DataFrame): DataFrame = {
    val confStr = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    val threshold =
      if (confStr.startsWith("-")) -1L
      else scala.util.Try(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(confStr)).getOrElse(-1L)
    if (threshold > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold)
      broadcast(df)
    else df
  }
}
