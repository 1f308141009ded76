package graft

import org.apache.spark.sql.functions._

import graft.operators.Changepoint

class ChangepointSpec extends SparkSpec {

  private def df(rows: Seq[(String, Long, Long, Double)]) = {
    import sqlImplicits._
    rows.toDF("k", "sec", "id", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"), col("v"))
  }

  test("planted level shift is located exactly, with the shift magnitude") {
    // 20 points at 1.0 then 20 points at 5.0: CUSUM peaks at i=20.
    val rows = (1 to 20).map(i => ("a", i.toLong, i.toLong, 1.0)) ++
      (21 to 40).map(i => ("a", i.toLong, i.toLong, 5.0))
    val got = Changepoint.cusum(df(rows), Seq("k"), "ts", "id", "v").collect().head
    assert(got.getLong(1) == 40L && got.getLong(2) == 20L && got.getLong(4) == 20L, got.toString)
    assert(math.abs(got.getDouble(5) - 4.0) < 1e-12, got.toString) // 5.0 − 1.0
    // peak |S| = 20·(mean −1.0) where mean = 3.0 → 40; scaled check
    assert(math.abs(got.getDouble(6) - 40.0) < 1e-12, got.toString)
  }

  test("constant series peaks nowhere meaningful: cusum 0, earliest tie wins") {
    val rows = (1 to 10).map(i => ("c", i.toLong, i.toLong, 2.5))
    val got = Changepoint.cusum(df(rows), Seq("k"), "ts", "id", "v").collect().head
    assert(got.getDouble(6) == 0.0 && got.getLong(4) == 1L, got.toString)
  }

  test("null keys and NaN are excluded; out-of-domain values raise") {
    import sqlImplicits._
    // null-key rows aggregated into totals and then vanished at the
    // non-null-safe equi-join — now excluded up front; NaN quantized
    // to a null yu that i counted but p skipped, corrupting n·S_i
    val rows = Seq(
      (Some("a"), 1L, 1L, 1.0), (Some("a"), 2L, 2L, 1.0),
      (Some("a"), 3L, 3L, Double.NaN),
      (Some("a"), 4L, 4L, 5.0), (Some("a"), 5L, 5L, 5.0),
      (None, 6L, 6L, 3.0))
    val df2 = rows.toDF("k", "sec", "id", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"), col("v"))
    val got = Changepoint.cusum(df2, Seq("k"), "ts", "id", "v").collect()
    assert(got.length == 1, s"null-key group must not appear: ${got.toSeq}")
    val a = got.head
    assert(a.getLong(1) == 4L, s"NaN row must not count toward n: $a")
    assert(a.getLong(4) == 2L, a.toString) // peak after the two 1.0s
    intercept[Exception] {
      Changepoint.cusum(
        df(Seq(("a", 1L, 1L, 1.0), ("a", 2L, 2L, 1e15))),
        Seq("k"), "ts", "id", "v").collect()
    }
  }

  test("matches a brute-force reference on noisy shifted series; partitioning invariant") {
    val rnd = new scala.util.Random(9)
    val rows = (for (k <- Seq("x", "y"); i <- 1 to 60) yield {
      val base = if (i <= 25) 10.0 else 13.0
      (k, i.toLong, i.toLong, base + rnd.nextGaussian())
    })
    val d = df(rows)
    val got = Changepoint.cusum(d, Seq("k"), "ts", "id", "v")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(4), r.getDouble(6)))
    for (k <- Seq("x", "y")) {
      val ys = rows.filter(_._1 == k).sortBy(_._2)
        .map(t => (BigDecimal(t._4).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLong)
      val n = ys.size.toLong
      val tot = ys.sum
      val pre = ys.scanLeft(0L)(_ + _).drop(1)
      val nss = pre.zipWithIndex.map { case (p, i0) =>
        val i = i0 + 1L; (math.abs(n * p - i * tot), i)
      }
      val best = nss.minBy { case (a, i) => (-a, i) }
      val (gi, gc) = got.find(_._1 == k).map(t => (t._2, t._3)).get
      assert(gi == best._2, s"$k pos $gi vs ${best._2}")
      assert(math.abs(gc - (best._1.toDouble / n) / 10000.0) < 1e-9, s"$k magnitude")
    }
    val rep = Changepoint.cusum(d.repartition(7), Seq("k"), "ts", "id", "v")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(4), r.getDouble(6)))
    assert(got.toSeq == rep.toSeq)
  }
}
