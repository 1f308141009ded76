package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded lifecycle for operator-internal persisted tables.
  *
  * Operators like MinHash-LSH and sign-LSH ANN materialize an
  * intermediate (signatures, prepared corpus) that both sides of a
  * self-join read. Bare `persist()` leaks: every invocation in a long
  * session (bench warm+timed pass, scale-probe loops over growing
  * replicas) registers another cached table, bounded only by the cache
  * manager's plan-dedup. Routing the persist through `swap` keeps at
  * most ONE live table per call-site key: re-invoking the operator on a
  * NEW input unpersists the previous round's table; re-invoking on the
  * SAME input (plan-equal — the bench warm/timed case) keeps the shared
  * cache entry hot.
  */
object OpCache {

  // Keyed by (session, call site): a plan-equal DataFrame from a
  // STOPPED session must never be handed back to a new one.
  private val live = scala.collection.mutable.Map
    .empty[(org.apache.spark.sql.SparkSession, String), DataFrame]

  def swap(key: String, df: DataFrame): DataFrame = synchronized {
    val k = (df.sparkSession, key)
    live.get(k) match {
      // Same input (plan-equal, so identical output attributes — both
      // plans come from the same operator code): hand back the live
      // cached table instead of re-registering it.
      case Some(old) if old.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) =>
        old
      case other =>
        other.foreach(_.unpersist(blocking = false))
        live.put(k, df)
        df.persist(StorageLevel.MEMORY_AND_DISK)
    }
  }

  // Operator-local caches that don't route through swap (e.g. the
  // k-means centroid memo, which caches EAGER localCheckpoint'd
  // results) register an eviction hook so clear() empties them too —
  // one call tears down ALL operator state.
  private val clearHooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  def registerClearHook(hook: () => Unit): Unit = synchronized {
    clearHooks += hook
  }

  /** Drop every live operator table (end-of-session / test teardown). */
  def clear(): Unit = synchronized {
    live.values.foreach(_.unpersist(blocking = false))
    live.clear()
    clearHooks.foreach(_.apply())
  }
}
