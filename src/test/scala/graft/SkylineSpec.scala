package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {

  test("frontier keeps exactly the non-dominated points") {
    import sqlImplicits._
    val pts = Seq(
      (1L, 1.0, 9.0),  // frontier (best y)
      (2L, 5.0, 5.0),  // frontier
      (3L, 9.0, 1.0),  // frontier (best x)
      (4L, 4.0, 4.0),  // dominated by 2
      (5L, 1.0, 8.0),  // dominated by 1 (same x, lower y)
      (6L, 8.0, 1.0))  // dominated by 3
      .toDF("id", "x", "y")
    val got = Skyline.skyline2D(pts, "x", "y", "id")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("exact duplicates keep the lowest id; nulls are excluded") {
    import sqlImplicits._
    val pts = Seq(
      (1L, Some(5.0), Some(5.0)),
      (2L, Some(5.0), Some(5.0)),   // duplicate of 1 → dropped
      (3L, None, Some(9.0)),        // null x → excluded
      (4L, Some(9.0), None))        // null y → excluded
      .toDF("id", "x", "y")
    val got = Skyline.skyline2D(pts, "x", "y", "id")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("NaN coordinates are excluded, not crowned") {
    import sqlImplicits._
    // one NaN y made the running max NaN: `NaN < y` is false for every
    // later row, so the rest of the frontier silently vanished while
    // the NaN row itself read as a skyline member
    val pts = Seq(
      (1L, 1.0, 9.0), (2L, 5.0, 5.0), (3L, 9.0, 1.0),
      (4L, 7.0, Double.NaN), (5L, Double.NaN, 2.0))
      .toDF("id", "x", "y")
    val got = Skyline.skyline2D(pts, "x", "y", "id")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L), s"got $got")
    // non-float columns skip the NaN guard entirely (type-gated)
    val ints = Seq((1L, 2, 3), (2L, 1, 1)).toDF("id", "x", "y")
    assert(Skyline.skyline2D(ints, "x", "y", "id").count() == 1L)
  }

  test("two-phase result equals the brute-force dominance filter; partitioning-independent") {
    import sqlImplicits._
    // deterministic scattered points with ties and duplicates
    val pts = (1 to 400).map { i =>
      (i.toLong, ((i * 37) % 83).toDouble, ((i * 53) % 97).toDouble)
    }
    val df = pts.toDF("id", "x", "y")
    def brute: Set[Long] = {
      val dominated = pts.filter { case (id, x, y) =>
        pts.exists { case (qid, qx, qy) =>
          qx >= x && qy >= y &&
            (qx > x || qy > y || (qx == x && qy == y && qid < id))
        }
      }.map(_._1).toSet
      pts.map(_._1).toSet -- dominated
    }
    val a = Skyline.skyline2D(df.coalesce(1), "x", "y", "id", buckets = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Skyline.skyline2D(df.repartition(13), "x", "y", "id", buckets = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == brute)
    assert(b == brute)
  }
}
