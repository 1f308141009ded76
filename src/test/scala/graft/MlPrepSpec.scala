package graft

import org.apache.spark.sql.functions._

import graft.operators.MlPrep

class MlPrepSpec extends SparkSpec {

  test("quantile bins: uniform data splits into equal bins with tight ranges") {
    import sqlImplicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val got = MlPrep.quantileBinReport(df, Seq("k"), "v", nBins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 10, got.toSeq.toString)
    assert(got.map(_._2).forall(n => n >= 9 && n <= 11), got.toSeq.toString)
    assert(got.map(_._2).sum == 100L)
    // ranges are disjoint and ordered
    assert(got.sliding(2).forall { case Array(a, b) => a._4 <= b._3; case _ => true })
  }

  test("label index: frequency-desc then label-asc tie-break, 0-based") {
    import sqlImplicits._
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("z") ++ Seq("m"))
      .map(Tuple1(_)).toDF("lab")
    val got = MlPrep.labelIndex(df, "lab").orderBy("idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq(("a", 5L, 0), ("b", 5L, 1), ("z", 2L, 2), ("m", 1L, 3)), got.toString)
  }

  test("md5 hash buckets: loads cover [0,256), totals preserved, JVM replica agrees") {
    import sqlImplicits._
    val toks = (1 to 500).map(i => Tuple1("tok" + (i % 73))).toDF("t")
    val got = MlPrep.md5HashBuckets(toks, "t").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).sum == 500L)
    assert(got.forall(b => b._1 >= 0 && b._1 < 256))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucketOf(s: String): Int = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(hex(0)) * 16 + "0123456789abcdef".indexOf(hex(1))
    }
    val exp = (1 to 500).map(i => "tok" + (i % 73)).groupBy(bucketOf)
      .map { case (b, g) => (b, g.size.toLong, g.distinct.size.toLong) }.toSet
    assert(got.toSet == exp, s"got=${got.toSet} exp=$exp")
  }

  test("psi: identical halves score ~0; a planted level shift scores far above 0.2") {
    import sqlImplicits._
    val same = (1 to 1000).map(i => ("g", i.toLong, (i % 100).toDouble)).toDF("k", "uid", "v")
    val p0 = MlPrep.psi(same, Seq("k"), "v", col("uid") % 2 === 0).collect().head.getDouble(3)
    assert(math.abs(p0) < 0.02, p0.toString)
    val shifted = (1 to 1000).map { i =>
      val ref = i % 2 == 0
      ("g", i.toLong, if (i % 2 == 0) (i % 100).toDouble else (i % 100) + 60.0)
    }.map(t => (t._1, t._2, t._3)).toDF("k", "uid", "v")
    val p1 = MlPrep.psi(shifted, Seq("k"), "v", col("uid") % 2 === 0).collect().head.getDouble(3)
    assert(p1 > 0.2, p1.toString)
  }

  test("psi: bins empty on one side still contribute (the full-grid path)") {
    import sqlImplicits._
    // current slice concentrated far above every reference decile:
    // bins 0..8 are current-empty, bin 9 ref-thin — all must contribute.
    val rows = (1 to 200).map(i => ("g", i.toLong, i.toDouble)) ++
      (201 to 260).map(i => ("g", i.toLong, 1000.0 + i))
    val df = rows.toDF("k", "uid", "v")
    val got = MlPrep.psi(df, Seq("k"), "v", col("uid") <= 200).collect().head
    assert(got.getLong(1) == 200L && got.getLong(2) == 60L, got.toString)
    assert(got.getDouble(3) > 1.0, got.toString) // total separation → large PSI
  }

  test("partitioning invariance across the family") {
    import sqlImplicits._
    val rnd = new scala.util.Random(17)
    val df = (1 to 400).map(i => ("g" + (i % 3), i.toLong, rnd.nextDouble() * 50))
      .toDF("k", "uid", "v")
    def all(d: org.apache.spark.sql.DataFrame) = (
      MlPrep.quantileBinReport(d, Seq("k"), "v", 5).orderBy("k", "bin").collect().map(_.toSeq).toSeq,
      MlPrep.psi(d, Seq("k"), "v", col("uid") % 2 === 0).orderBy("k").collect().map(_.toSeq).toSeq)
    assert(all(df) == all(df.repartition(13)))
  }

  test("targetEncode shrinks rare keys toward the exact global mean") {
    import sqlImplicits._
    val df = Seq(("k1", 10.0), ("k1", 10.0), ("k2", 30.0)).toDF("k", "y")
    val got = MlPrep.targetEncode(df, "k", "y", 1.0).orderBy("key").collect()
    // global mean 50/3; enc_k1 = (20 + 50/3)/3 = 110/9; enc_k2 = (30 + 50/3)/2 = 70/3
    assert(got(0).getString(0) == "k1" && got(0).getLong(1) == 2L)
    assert(math.abs(got(0).getDouble(2) - 110.0 / 9.0) < 1e-9)
    assert(math.abs(got(1).getDouble(2) - 70.0 / 3.0) < 1e-9)
    // m huge: every key collapses onto the global mean
    val big = MlPrep.targetEncode(df, "k", "y", 1e9).collect()
    big.foreach(r => assert(math.abs(r.getDouble(2) - 50.0 / 3.0) < 1e-6))
  }

  test("scalingReport emits the exact standardizer parameters") {
    import sqlImplicits._
    val df = Seq((1.0, 10.0), (2.0, 10.0), (3.0, 10.0), (4.0, 10.0)).toDF("x", "k")
    val got = MlPrep.scalingReport(df, Seq("x", "k")).orderBy("col_name").collect()
    val k = got(0)
    assert(k.getString(0) == "k" && k.getLong(1) == 4L && k.getDouble(5) == 0.0)
    val x = got(1)
    assert(x.getDouble(2) == 1.0 && x.getDouble(3) == 4.0 && x.getDouble(4) == 2.5)
    assert(math.abs(x.getDouble(5) - math.sqrt(5.0 / 3.0)) < 1e-9)
  }

  test("mutualInfo: perfect dependence gives ln 2, independence gives 0") {
    import sqlImplicits._
    val dep = ((1 to 5).map(_ => ("a", "a")) ++ (1 to 5).map(_ => ("b", "b"))).toDF("x", "y")
    val d = MlPrep.mutualInfo(dep, "x", "y").collect()(0)
    assert(d.getLong(0) == 10L && d.getLong(1) == 2L)
    // each cell: round(0.5·ln2·1e6) = 346574 → 693148 micro-nats
    assert(d.getLong(2) == 693148L)
    val ind = (for { x <- Seq("a", "b"); y <- Seq("c", "d"); _ <- 1 to 2 } yield (x, y))
      .toDF("x", "y")
    val i = MlPrep.mutualInfo(ind, "x", "y").collect()(0)
    assert(i.getLong(2) == 0L, s"independent MI should be 0, got ${i.getLong(2)}")
  }

  test("rankNormalize: ties share the midpoint, extremes hit 0 and 1") {
    import sqlImplicits._
    val df = Seq(("g", 10L), ("g", 20L), ("g", 20L), ("g", 30L), ("s", 5L)).toDF("k", "v")
    val out = MlPrep.rankNormalize(df, Seq("k"), "v")
      .orderBy("k", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("g", 10L, 1L, 2L, 0.0),
      ("g", 20L, 2L, 5L, 0.5), // doubled avg rank 2.5
      ("g", 30L, 1L, 8L, 1.0),
      ("s", 5L, 1L, 2L, 0.5))) // one-value group: midpoint
  }

  test("quantile bins and PSI exclude NaN values instead of poisoning the top bin") {
    import sqlImplicits._
    // NaN passes isNotNull and NaN >= edge is TRUE for every edge —
    // NaN rows inflated the top bin and its reported hi became NaN
    val df = ((1 to 40).map(i => ("g", i.toDouble)) ++
      Seq(("g", Double.NaN), ("g", Double.NaN))).toDF("grp", "v")
    val bins = MlPrep.quantileBinReport(df, Seq("grp"), "v", nBins = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(bins.map(_._2).sum == 40L, "NaN rows must not be binned")
    assert(bins.forall(b => !b._3.isNaN), s"no bin hi may be NaN, got ${bins.toSeq}")
    // the EDGES must come from the NaN-free frame too (the oracle's
    // shape): percentile over the NaN-bearing frame interpolates over
    // 42 sorted values (NaN above all doubles) and shifts every edge
    // right — equal-frequency bins over 1..40 are exactly 10/10/10/10
    assert(bins.sortBy(_._1).map(_._2).toSeq == Seq(10L, 10L, 10L, 10L),
      s"edges must interpolate over the NaN-free values, got ${bins.toSeq}")
    val psi = MlPrep.psi(
      df.withColumn("u", monotonically_increasing_id()),
      Seq("grp"), "v", col("u") % 2 === 0, nBins = 4)
      .head()
    assert(!psi.getAs[Double]("psi").isNaN)
  }

  test("scalingReport: NaN excluded from n, constant column std is 0, ±Inf raises") {
    import sqlImplicits._
    // NaN previously passed isNotNull, counted in n, and quantized to
    // NULL inside the moment sums — mean computed over an inflated
    // denominator (here 0.5 instead of 1.0)
    val df = Seq(1.0, Double.NaN).map(Tuple1(_)).toDF("v")
    val row = MlPrep.scalingReport(df, Seq("v")).head()
    assert(row.getAs[Long]("n") == 1L, row.toString)
    assert(row.getAs[Double]("mean") == 1.0, row.toString)
    // a constant column's variance numerator can round negative past
    // 2^53 — the clamp keeps std at 0, never NaN
    val const = Seq.fill(1000)(1e5).map(Tuple1(_)).toDF("v")
    val stdRow = MlPrep.scalingReport(const, Seq("v")).head()
    assert(stdRow.getAs[Double]("std") == 0.0, stdRow.toString)
    // out-of-domain values RAISE (the Stats.quantizable contract)
    val inf = Seq(1.0, Double.PositiveInfinity).map(Tuple1(_)).toDF("v")
    val err = intercept[Exception] { MlPrep.scalingReport(inf, Seq("v")).collect() }
    assert(err.getMessage != null)
  }

  test("targetEncode: NaN targets are excluded, not silently diluted") {
    import sqlImplicits._
    val df = Seq(("a", 10.0), ("a", Double.NaN), ("b", 4.0)).toDF("k", "y")
    val got = MlPrep.targetEncode(df, "k", "y", m = 1.0)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // NaN row gone: n('a') = 1, global mean = (10+4)/2 = 7
    // enc(a) = (10 + 1·7)/(1+1) = 8.5 ; enc(b) = (4 + 7)/2 = 5.5
    assert(got.toSeq == Seq(("a", 1L, 8.5), ("b", 1L, 5.5)), got.toSeq.toString)
  }

  test("rankNormalize: NaN values have no rank — the true max keeps norm 1.0") {
    import sqlImplicits._
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", Double.NaN)).toDF("k", "v")
    val got = MlPrep.rankNormalize(df, Seq("k"), "v")
      .orderBy("value").collect()
      .map(r => (r.getDouble(1), r.getDouble(4)))
    assert(got.toSeq == Seq((1.0, 0.0), (2.0, 1.0)),
      s"NaN must be excluded (it outranked the max and stole norm 1.0): ${got.toSeq}")
  }
}
