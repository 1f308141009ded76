package graft

import org.apache.spark.sql.functions._

import graft.operators.ZoneMap

class ZoneMapSpec extends SparkSpec {

  private def df = {
    import sqlImplicits._
    Seq(
      // zone 0: v in [10, 20], w non-null
      (0, 10.0, Some(1.0)), (0, 20.0, Some(2.0)),
      // zone 1: v in [100, 200]
      (1, 100.0, Some(3.0)), (1, 200.0, Some(4.0)),
      // zone 2: w entirely null
      (2, 50.0, None), (2, 60.0, None))
      .toDF("z", "v", "w")
  }

  test("stats collects min/max/non-null counts per zone") {
    val st = ZoneMap.stats(df, col("z"), Seq("v", "w")).orderBy("zone")
      .collect()
    assert(st.length == 3)
    val z0 = st(0)
    assert(z0.getAs[Long]("n_rows") == 2L)
    assert(z0.getAs[Double]("min_v") == 10.0 && z0.getAs[Double]("max_v") == 20.0)
    assert(z0.getAs[Long]("nn_w") == 2L)
    assert(st(2).getAs[Long]("nn_w") == 0L)
  }

  test("pruneAudit skips zones disjoint from any conjunct, keeps overlapping ones") {
    val st = ZoneMap.stats(df, col("z"), Seq("v", "w"))
    // predicate: v in [15, 120] AND w in [0, 10]
    val audit = ZoneMap.pruneAudit(
        st, Seq(("v", lit(15.0), lit(120.0)), ("w", lit(0.0), lit(10.0))))
      .orderBy("zone").collect()
    // zone 0: v window [10,20] overlaps, w fine → scan
    assert(!audit(0).getAs[Boolean]("skippable"))
    // zone 1: v window [100,200] overlaps [15,120] → v can't prune it
    assert(!audit(1).getAs[Boolean]("skip_v"))
    // zone 2: v [50,60] overlaps, but w all-null → skippable via w
    assert(audit(2).getAs[Boolean]("skip_w"))
    assert(audit(2).getAs[Boolean]("skippable"))
  }

  test("pruneAudit respects inclusive bounds at the edges") {
    val st = ZoneMap.stats(df, col("z"), Seq("v"))
    // hi exactly at zone 0's min: still overlapping (inclusive)
    val keep = ZoneMap.pruneAudit(st, Seq(("v", lit(0.0), lit(10.0))))
      .filter(col("zone") === 0).head()
    assert(!keep.getAs[Boolean]("skip_v"))
    // hi strictly below zone 0's min: prune
    val skip = ZoneMap.pruneAudit(st, Seq(("v", lit(0.0), lit(9.99))))
      .filter(col("zone") === 0).head()
    assert(skip.getAs[Boolean]("skip_v"))
  }
}
