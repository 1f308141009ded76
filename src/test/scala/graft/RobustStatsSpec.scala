package graft

import org.apache.spark.sql.functions._

import graft.operators.RobustStats

class RobustStatsSpec extends SparkSpec {

  private def sample = {
    import sqlImplicits._
    // g1: 1..100 plus two wild points; g2: constant
    val g1 = (1 to 100).map(i => ("g1", i.toDouble)) ++ Seq(("g1", 1e6), ("g1", -1e6))
    val g2 = (1 to 20).map(_ => ("g2", 7.0))
    (g1 ++ g2).toDF("g", "v")
  }

  test("fences are robust: wild points don't move the quartiles") {
    val f = RobustStats.iqrFences(sample, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = f("g1")
    // quartiles of 1..100 (+2 wild): q1≈25.x, q3≈75.x — nowhere near 1e6
    assert(g1.getDouble(1) > 20 && g1.getDouble(1) < 30)
    assert(g1.getDouble(2) > 70 && g1.getDouble(2) < 80)
    val g2 = f("g2")
    assert(g2.getDouble(1) == 7.0 && g2.getDouble(2) == 7.0 && g2.getDouble(3) == 0.0)
  }

  test("iqrSummary counts exactly the fence-crossers") {
    val s = RobustStats.iqrSummary(sample, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(s("g1").getLong(2) == 2L) // the two planted wild points
    assert(s("g2").getLong(2) == 0L)
    assert(s("g1").getLong(1) == 102L)
  }

  test("mad matches the hand-computed values") {
    val m = RobustStats.mad(sample, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // 102 values: median of 1..100+two wilds = 50.5. Deviations
    // sorted: (k−0.5) twice for k=1..50, then the two wilds — the
    // 51st/52nd order statistics are both 25.5 → MAD 25.5.
    assert(m("g1")._1 == 50.5 && m("g1")._2 == 25.5)
    assert(m("g2") == ((7.0, 0.0)))
  }

  test("classification is independent of partitioning") {
    val a = RobustStats.iqrOutliers(sample.coalesce(1), Seq("g"), "v")
      .select("g", "v", "is_outlier").collect().map(_.toSeq).toSet
    val b = RobustStats.iqrOutliers(sample.repartition(11), Seq("g"), "v")
      .select("g", "v", "is_outlier").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("winsorize clips at the exact band, guards nulls, and the summary counts both tails") {
    import sqlImplicits._
    val vals: Seq[java.lang.Double] =
      (1 to 99).map(i => java.lang.Double.valueOf(i.toDouble)) :+ (null: java.lang.Double)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i, v) }.toDF("k", "id", "v")
    val wins = graft.operators.RobustStats.winsorize(df, Seq("k"), "v", 0.10, 0.90)
      .collect().map(r => (r.get(2), r.get(5), r.get(6)))
    // exact p10/p90 of 1..99: pos = p*(n-1) over sorted values
    val lo = 1.0 + 0.10 * 98.0
    val hi = 1.0 + 0.90 * 98.0
    assert(wins.collect { case (v: java.lang.Double, w, _) if v.doubleValue < lo => w }
      .forall(_ == lo))
    assert(wins.collect { case (v: java.lang.Double, w, _) if v.doubleValue > hi => w }
      .forall(_ == hi))
    assert(wins.exists { case (v, w, c) => v == null && w == null && c == null })
    val sm = graft.operators.RobustStats.winsorizeSummary(df, Seq("k"), "v", 0.10, 0.90)
      .collect().head
    assert(sm.getLong(1) == 99L && sm.getLong(2) == 10L && sm.getLong(3) == 10L, sm.toString)
    assert(sm.getDouble(4) == lo && sm.getDouble(5) == hi, sm.toString)
    assert(sm.getDouble(6) == 50.0, sm.toString) // mean of 1..99
  }
}
