package graft

import org.apache.spark.storage.StorageLevel

import graft.operators.OpCache

/** Lifecycle tests for the operator-table cache: the swap contract
  * (one live table per call site) must survive an EXTERNAL unpersist —
  * `spark.catalog.clearCache()` (or an unpersist of any plan-equal
  * frame, since the cache manager matches by plan) strips persistence
  * out from under a live entry; handing it back unrepaired makes every
  * subsequent "cache hit" silently recompute the full lineage (the
  * r8 x91 isolated-retime anomaly class).
  */
class OpCacheSpec extends SparkSpec {

  private def plan() = {
    import sqlImplicits._
    (1 to 100).toDF("n").groupBy((org.apache.spark.sql.functions.col("n") % 7).as("k")).count()
  }

  test("swap re-pins a live entry after an external clearCache") {
    val a = OpCache.swap("opcachespec.swap", plan())
    a.count()
    assert(a.storageLevel != StorageLevel.NONE)
    spark.catalog.clearCache() // the external rug-pull
    assert(a.storageLevel == StorageLevel.NONE)
    val b = OpCache.swap("opcachespec.swap", plan())
    assert(b.storageLevel != StorageLevel.NONE,
      "a plan-equal swap hit must re-pin the unpersisted entry, not return a ghost")
    OpCache.clear()
  }

  test("swapKeyed re-pins on a fingerprint hit after an external clearCache") {
    implicit val s = spark
    val a = OpCache.swapKeyed("opcachespec.keyed", "fp1", plan())
    a.count()
    assert(a.storageLevel != StorageLevel.NONE)
    spark.catalog.clearCache()
    assert(a.storageLevel == StorageLevel.NONE)
    val b = OpCache.swapKeyed("opcachespec.keyed", "fp1", plan())
    assert(b.storageLevel != StorageLevel.NONE,
      "a fingerprint hit must re-pin the unpersisted entry")
    // a CHANGED fingerprint still rebuilds
    val c = OpCache.swapKeyed("opcachespec.keyed", "fp2", plan())
    assert(c.storageLevel != StorageLevel.NONE)
    OpCache.clear()
  }
}
