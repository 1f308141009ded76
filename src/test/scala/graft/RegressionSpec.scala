package graft

import org.apache.spark.sql.functions._

import graft.operators.Regression

class RegressionSpec extends SparkSpec {

  private def ev(rows: Seq[(String, Long, Double)]) = {
    import sqlImplicits._
    rows.toDF("event_type", "sec", "value")
      .select(col("event_type"), timestamp_seconds(col("sec")).as("ts"), col("value"))
  }

  test("perfect line recovers slope, intercept and r2 = 1") {
    // y = 2·x + 5 with x = seconds since the group's first event
    val rows = (0L to 10L).map(s => ("a", 1000L + s, 5.0 + 2.0 * s))
    val got = Regression.trend(ev(rows), Seq("event_type"), "ts", "value").collect().head
    assert(got.getString(0) == "a" && got.getLong(1) == 11L)
    assert(math.abs(got.getDouble(2) - 2.0 * 86400.0) < 1e-6, got.toString)
    assert(math.abs(got.getDouble(3) - 5.0) < 1e-9, got.toString)
    assert(math.abs(got.getDouble(4) - 1.0) < 1e-12, got.toString)
  }

  test("zero x-variance and zero y-variance yield NULL fits, not division blowups") {
    val sameTs = ev(Seq(("a", 50L, 1.0), ("a", 50L, 3.0)))
    val r1 = Regression.trend(sameTs, Seq("event_type"), "ts", "value").collect().head
    assert(r1.isNullAt(2) && r1.isNullAt(3) && r1.isNullAt(4), r1.toString)
    val constY = ev(Seq(("a", 1L, 7.0), ("a", 2L, 7.0), ("a", 3L, 7.0)))
    val r2 = Regression.trend(constY, Seq("event_type"), "ts", "value").collect().head
    assert(math.abs(r2.getDouble(2)) < 1e-12 && r2.isNullAt(4), r2.toString)
  }

  test("trend matches a double-precision reference within quantization error") {
    val rnd = new scala.util.Random(3)
    val rows = for (g <- Seq("a", "b"); i <- 1 to 200)
      yield (g, i * 60L + rnd.nextInt(30), 10.0 + 0.01 * i + rnd.nextGaussian())
    val got = Regression.trend(ev(rows), Seq("event_type"), "ts", "value")
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    for (g <- Seq("a", "b")) {
      val pts = rows.filter(_._1 == g)
      val x0 = pts.map(_._2).min
      val xs = pts.map(p => (p._2 - x0).toDouble)
      val ys = pts.map(p => math.rint(p._3 * 1e4) / 1e4) // the DECIMAL(18,4) quantization
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val syy = ys.map(y => y * y).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val r2 = math.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (gs, gi, gr) = got.find(_._1 == g).map(t => (t._2, t._3, t._4)).get
      assert(math.abs(gs - slope * 86400.0) < 1e-6 * math.abs(slope * 86400.0) + 1e-9, s"$g slope")
      assert(math.abs(gi - icept) < 1e-6, s"$g intercept $gi vs $icept")
      assert(math.abs(gr - r2) < 1e-9, s"$g r2 $gr vs $r2")
    }
  }

  test("pearson r2: perfect and anti correlation are 1, and partitioning cannot change a bit") {
    import sqlImplicits._
    val rows = (1 to 100).map(i => ("g", i.toDouble, 42.0 - 3.0 * i)) ++
      (1 to 100).map(i => ("h", i.toDouble, ((i * 2654435761L) % 97).toDouble))
    val df = rows.toDF("k", "x", "y")
    val a = Regression.pearsonR2(df, Seq("k"), "x", "y").orderBy("k").collect()
    assert(math.abs(a(0).getDouble(2) - 1.0) < 1e-12, a(0).toString)
    assert(a(1).getDouble(2) < 0.5, a(1).toString)
    val b = Regression.pearsonR2(df.repartition(17), Seq("k"), "x", "y").orderBy("k").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("acf recovers the alternating-series signature and nulls degenerate groups") {
    import sqlImplicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows =
      (0 until 10).map(i => ("g", new java.sql.Timestamp(t0 + i * 1000L), i.toLong,
        if (i % 2 == 0) 1.0 else -1.0)) ++
      (0 until 6).map(i => ("c", new java.sql.Timestamp(t0 + i * 1000L), i.toLong, 7.0))
    val df = rows.toDF("k", "ts", "id", "v")
    val got = Regression.acf(df, Seq("k"), "ts", "id", "v", 3)
      .orderBy("k", "lag").collect()
    // constant series: zero variance -> null acf at every lag
    assert(got.take(3).forall(_.isNullAt(4)))
    // alternating +-1, mean 0: r_l = (-1)^l * (n-l)/n with n=10
    val g = got.drop(3)
    assert(math.abs(g(0).getDouble(4) - (-0.9)) < 1e-9)
    assert(math.abs(g(1).getDouble(4) - 0.8) < 1e-9)
    assert(math.abs(g(2).getDouble(4) - (-0.7)) < 1e-9)
    val rep = Regression.acf(df.repartition(7), Seq("k"), "ts", "id", "v", 3)
      .orderBy("k", "lag").collect()
    assert(got.map(_.toSeq).toSeq == rep.map(_.toSeq).toSeq)
  }

  test("rollingCorr: perfect linear frames give plus/minus 1, degenerate frames null") {
    import sqlImplicits._
    val rows = (1 to 6).map(t => ("g", t.toLong, t.toLong, 2L * t + 3)) ++
      (1 to 6).map(t => ("h", t.toLong, t.toLong, -t.toLong)) ++
      (1 to 6).map(t => ("z", t.toLong, t.toLong, 7L))
    val out = Regression.rollingCorr(rows.toDF("k", "t", "x", "y"), Seq("k"), "t", "x", "y", 3)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    // first window-1 ticks per key: incomplete frame -> null
    assert(out.filter(_._2 <= 2).forall(_._3.isNaN))
    assert(out.filter(o => o._1 == "g" && o._2 >= 3).forall(_._3 == 1.0))
    assert(out.filter(o => o._1 == "h" && o._2 >= 3).forall(_._3 == -1.0))
    // zero-variance y: r undefined
    assert(out.filter(_._1 == "z").forall(_._3.isNaN))
  }

  test("rollingCorr: billion-scale quantized values survive the frame sums (no long wrap)") {
    import sqlImplicits._
    // |x| ~4e9 wraps x·x in long arithmetic (ANSI: job-killing
    // overflow); the DECIMAL(38,0) partials stay exact and the
    // perfectly linear frame still reads r = 1. Alternating signs
    // keep the frame variance huge, so the double closed form has no
    // catastrophic cancellation to hide behind.
    val big = 4000000000L
    val rows = (1 to 5).map { t =>
      val x = (if (t % 2 == 0) big else -big) + t
      ("g", t.toLong, x, 2L * x)
    }
    val out = Regression.rollingCorr(rows.toDF("k", "t", "x", "y"), Seq("k"), "t", "x", "y", 3)
      .orderBy("t").collect()
    assert(out.filter(_.getLong(1) >= 3).forall(_.getDouble(3) == 1.0))
  }
}
