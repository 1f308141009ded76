package graft

import org.apache.spark.sql.functions._

import graft.operators.GridCluster

class GridClusterSpec extends SparkSpec {

  // Points centered in cell (cx, cy) at step 1000 µ° (0.001°).
  private def cellPts(cx: Long, cy: Long, n: Int): Seq[(Double, Double)] =
    (1 to n).map(_ => (cx * 0.001 + 0.0005, cy * 0.001 + 0.0005))

  test("coreCells merges 8-neighbor dense cells, keeps singletons, drops sparse cells") {
    import sqlImplicits._
    // component {(0,0), (0,1), (1,2)} — the last link is diagonal;
    // (5,5) is a singleton core cell; (9,9) is below minPts.
    val pts = (cellPts(0, 0, 3) ++ cellPts(0, 1, 4) ++ cellPts(1, 2, 3) ++
      cellPts(5, 5, 3) ++ cellPts(9, 9, 2)).toDF("lat", "lng")
    val got = GridCluster.coreCells(pts, "lat", "lng", 1000L, 3L)
      .orderBy("cell_id").collect()
    assert(got.length == 4)
    val byCell = got.map(r => ((r.getLong(1), r.getLong(2)), r.getLong(4))).toMap
    // min cell id of the component: (0,0) → id 0
    assert(byCell((0L, 0L)) == 0L)
    assert(byCell((0L, 1L)) == 0L && byCell((1L, 2L)) == 0L)
    // singleton keeps its own id
    assert(byCell((5L, 5L)) == 5L * 4000000L + 5L)
  }

  test("clusterReport aggregates cells, points and the bounding box per cluster") {
    import sqlImplicits._
    val pts = (cellPts(0, 0, 3) ++ cellPts(0, 1, 4) ++ cellPts(1, 2, 3) ++
      cellPts(5, 5, 3) ++ cellPts(9, 9, 2)).toDF("lat", "lng")
    val got = GridCluster.clusterReport(pts, "lat", "lng", 1000L, 3L)
      .orderBy("cluster_id").collect()
    assert(got.length == 2)
    val big = got(0)
    assert(big.getLong(1) == 3L && big.getLong(2) == 10L) // 3 cells, 3+4+3 points
    assert(big.getLong(3) == 0L && big.getLong(4) == 1L)  // cx range
    assert(big.getLong(5) == 0L && big.getLong(6) == 2L)  // cy range
    val single = got(1)
    assert(single.getLong(1) == 1L && single.getLong(2) == 3L)
  }

  test("negative coordinates bucket by floor division, not truncation") {
    import sqlImplicits._
    val pts = (1 to 3).map(_ => (-0.0005, -0.0005)).toDF("lat", "lng")
    val got = GridCluster.coreCells(pts, "lat", "lng", 1000L, 3L).head()
    assert(got.getAs[Long]("cx") == -1L && got.getAs[Long]("cy") == -1L)
  }

  test("NaN/Inf/out-of-range coordinates are dropped, not pooled into a phantom cell") {
    import sqlImplicits._
    // corrupt coordinates cast to NULL decimal (ANSI off): every such
    // point worldwide collapsed into one (null, null) cell that could
    // pass minPts and emit a null-id "cluster"
    val pts = (cellPts(0, 0, 3) ++ Seq(
      (Double.NaN, 0.0), (0.0, Double.PositiveInfinity),
      (95.0, 0.0), (0.0, -181.0),
      (Double.NaN, Double.NaN))).toDF("lat", "lng")
    val got = GridCluster.coreCells(pts, "lat", "lng", 1000L, 3L).collect()
    assert(got.length == 1, s"only the real cell survives: ${got.toSeq}")
    assert(got.head.getAs[Long]("cx") == 0L && got.head.getAs[Long]("cy") == 0L)
    // the 5 corrupt points alone can never form a core cell
    val onlyBad = Seq((Double.NaN, 0.0), (95.0, 0.0), (0.0, 200.0)).toDF("lat", "lng")
    assert(GridCluster.coreCells(onlyBad, "lat", "lng", 1000L, 1L).count() == 0L)
  }

  test("a step below the cell-id packing bound raises loudly") {
    import sqlImplicits._
    val pts = Seq((0.0, 0.0)).toDF("lat", "lng")
    intercept[IllegalArgumentException] {
      GridCluster.coreCells(pts, "lat", "lng", 50L, 1L)
    }
  }
}
