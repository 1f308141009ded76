package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class StatsSpec extends SparkSpec {

  test("chi2Independence reproduces the hand-computed 2x2 statistic") {
    import sqlImplicits._
    // classic 2×2: rows (T, F) × cols (X, Y) with counts 10/20/20/10
    val df = (Seq.fill(10)(("T", "X")) ++ Seq.fill(20)(("T", "Y")) ++
      Seq.fill(20)(("F", "X")) ++ Seq.fill(10)(("F", "Y"))).toDF("a", "b")
    val r = Stats.chi2Independence(df, "a", "b").head()
    assert(r.getAs[Long]("n") == 60L)
    assert(r.getAs[Int]("dof") == 1)
    // e = 15 each cell; chi2 = 4·(5²/15) = 20/3
    assert(math.abs(r.getAs[Double]("chi2") - 20.0 / 3.0) < 1e-4)
  }

  test("chi2Independence is ~0 for perfectly independent margins") {
    import sqlImplicits._
    val df = (for { a <- Seq("p", "q"); b <- Seq("x", "y", "z"); _ <- 1 to 7 }
      yield (a, b)).toDF("a", "b")
    val r = Stats.chi2Independence(df, "a", "b").head()
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Int]("dof") == 2)
  }

  test("ksTest: identical samples give D = 0, disjoint samples give D = 1") {
    import sqlImplicits._
    val s1 = (1 to 100).map(_.toDouble).toDF("value")
    val same = Stats.ksTest(s1, s1, "value").head()
    assert(same.getAs[Double]("d") == 0.0 && !same.getAs[Boolean]("reject_05"))
    val s2 = (101 to 200).map(_.toDouble).toDF("value")
    val disj = Stats.ksTest(s1, s2, "value").head()
    assert(disj.getAs[Double]("d") == 1.0 && disj.getAs[Boolean]("reject_05"))
  }

  test("ksTest matches a hand-computed small case with ties") {
    import sqlImplicits._
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("value")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("value")
    // F_a: 1→.25 2→.5 3→.75 4→1 5→1 6→1 ; F_b: 3→.25 4→.5 5→.75 6→1
    // max gap at v=2: |.5 − 0| = .5
    val r = Stats.ksTest(a, b, "value").head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("d") == 0.5)
    assert(!r.getAs[Boolean]("reject_05")) // threshold at n=4: 1.358·√(8/16) = 0.96
  }

  test("mannWhitneyU matches the hand-computed rank-sum with ties") {
    import sqlImplicits._
    // a = {1, 2, 2}, b = {2, 3}: ranks 1, (2+3+4)/3=3, 5
    // R_a = 1 + 3 + 3 = 7 → U_a = 7 − 3·4/2 = 1
    val a = Seq(1.0, 2.0, 2.0).toDF("value")
    val b = Seq(2.0, 3.0).toDF("value")
    val r = Stats.mannWhitneyU(a, b, "value").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_a") == 1.0)
    assert(!r.getAs[Boolean]("reject_05"))
  }

  test("ksTest/mannWhitneyU: an empty side keeps the old zero-total/null-d shape") {
    import sqlImplicits._
    // pins the r14 bounds rewrite's edge: totals/bounds now come from
    // the PRE-join side aggregates (least/greatest + coalesced sums),
    // and an empty side must read exactly like the old joined
    // carryTotals pass did — n_a = 0 (not null), bounds from the
    // non-empty side alone
    val a = Seq.empty[Double].toDF("value")
    val b = Seq(1.0, 2.0, 3.0).toDF("value")
    val ks = Stats.ksTest(a, b, "value").head()
    assert(ks.getAs[Long]("n_a") == 0L && ks.getAs[Long]("n_b") == 3L)
    val mw = Stats.mannWhitneyU(a, b, "value").head()
    assert(mw.getAs[Long]("n_a") == 0L && mw.getAs[Long]("n_b") == 3L)
    assert(mw.getAs[Double]("u_a") == 0.0)
  }

  test("mannWhitneyU rejects for clearly shifted samples, not identical ones") {
    import sqlImplicits._
    val lo = (1 to 200).map(_.toDouble % 50).toDF("value")
    val hi = (1 to 200).map(i => 100.0 + i % 50).toDF("value")
    assert(Stats.mannWhitneyU(lo, hi, "value").head().getAs[Boolean]("reject_05"))
    assert(!Stats.mannWhitneyU(lo, lo, "value").head().getAs[Boolean]("reject_05"))
    // U_a for identical samples = n_a·n_b/2 (symmetry)
    assert(Stats.mannWhitneyU(lo, lo, "value").head().getAs[Double]("u_a") == 20000.0)
  }

  test("results are independent of partitioning") {
    import sqlImplicits._
    val df = (1 to 600).map(i => (s"a${i % 3}", s"b${(i * 7) % 5}")).toDF("a", "b")
    val x = Stats.chi2Independence(df.coalesce(1), "a", "b").head().getAs[Double]("chi2")
    val y = Stats.chi2Independence(df.repartition(11), "a", "b").head().getAs[Double]("chi2")
    assert(x == y)
    val v1 = (1 to 300).map(i => (i % 37).toDouble).toDF("value")
    val v2 = (1 to 300).map(i => ((i * 13) % 41).toDouble).toDF("value")
    val d1 = Stats.ksTest(v1.coalesce(1), v2.coalesce(1), "value").head().getAs[Double]("d")
    val d2 = Stats.ksTest(v1.repartition(7), v2.repartition(5), "value").head().getAs[Double]("d")
    assert(d1 == d2)
  }

  test("welchTTest matches the hand-computed unequal-variance case") {
    import sqlImplicits._
    val a = Seq(1.0, 2.0, 3.0).toDF("value")
    val b = Seq(4.0, 5.0, 7.0).toDF("value")
    val r = Stats.welchTTest(a, b, "value").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(math.abs(r.getAs[Double]("mean_a") - 2.0) < 1e-9)
    // ma=2 va=1; mb=16/3 vb=7/3; se2=10/9; t2=(10/3)^2/(10/9)=10; df=100/29
    assert(math.abs(r.getAs[Double]("t2") - 10.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("df_welch") - 100.0 / 29.0) < 1e-6)
    assert(r.getAs[Boolean]("reject_05"))
  }

  test("welchTTest on identical samples: t2 = 0, no rejection") {
    import sqlImplicits._
    val s1 = (1 to 50).map(i => (i % 7).toDouble).toDF("value")
    val r = Stats.welchTTest(s1, s1, "value").head()
    assert(r.getAs[Double]("t2") == 0.0 && !r.getAs[Boolean]("reject_05"))
  }

  test("bootstrapMeanCI: constant data collapses the interval onto the exact mean") {
    import sqlImplicits._
    val df = (1 to 200).map(i => (i.toLong, 5.0)).toDF("id", "value")
    val r = Stats.bootstrapMeanCI(df, "id", "value").head()
    assert(r.getAs[Long]("n") == 200L)
    assert(r.getAs[Double]("mean_point") == 5.0)
    assert(r.getAs[Double]("ci_lo") == 5.0 && r.getAs[Double]("ci_hi") == 5.0)
  }

  test("bootstrapMeanCI brackets the mean and is bit-deterministic under repartitioning") {
    import sqlImplicits._
    val df = (1 to 500).map(i => (i.toLong, ((i * 2654435761L) % 101).toDouble))
      .toDF("id", "value")
    val r1 = Stats.bootstrapMeanCI(df.coalesce(1), "id", "value").head()
    val r2 = Stats.bootstrapMeanCI(df.repartition(13), "id", "value").head()
    assert(r1.toSeq == r2.toSeq)
    assert(r1.getAs[Double]("ci_lo") <= r1.getAs[Double]("mean_point"))
    assert(r1.getAs[Double]("ci_hi") >= r1.getAs[Double]("mean_point"))
    // sd ~ 29, n = 500 -> se ~ 1.3; the ~94% interval must be a few se wide
    assert(r1.getAs[Double]("ci_hi") - r1.getAs[Double]("ci_lo") < 20.0)
  }

  test("kaplanMeier matches the hand-computed censored curve") {
    import sqlImplicits._
    // durations/events: (1,e) (2,c) (3,e) (3,e) (4,c)
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1), (4.0, 0)).toDF("dur", "e")
    val got = Stats.kaplanMeier(df, "dur", "e").orderBy("t").collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(got.map(_.getLong(1)).toSeq == Seq(5L, 4L, 3L, 1L)) // at risk
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 0L, 2L, 0L)) // events
    assert(got.map(_.getLong(3)).toSeq == Seq(0L, 1L, 0L, 1L)) // censored
    val t1 = math.round(math.log(4.0 / 5.0) * 1e6)
    val t3 = math.round(math.log(1.0 / 3.0) * 1e6)
    assert(math.abs(got(0).getLong(4) - t1) <= 1)
    assert(got(1).getLong(4) == got(0).getLong(4)) // censoring leaves S unchanged
    assert(math.abs(got(2).getLong(4) - (t1 + t3)) <= 2)
    assert(got(3).getLong(4) == got(2).getLong(4))
  }

  test("kaplanMeier nulls the terminal S = 0 row instead of overflowing") {
    import sqlImplicits._
    val df = Seq((1.0, 1), (2.0, 1)).toDF("dur", "e")
    val got = Stats.kaplanMeier(df, "dur", "e").orderBy("t").collect()
    assert(got(0).getLong(1) == 2L && !got(0).isNullAt(4))
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 1L && got(1).isNullAt(4))
  }

  test("gini: equality gives 0, full concentration gives (n-1)/n, negatives are counted") {
    import sqlImplicits._
    val eq = Seq(5.0, 5.0, 5.0, 5.0).toDF("v")
    assert(Stats.gini(eq, "v").head().getAs[Double]("gini") == 0.0)
    val conc = Seq(0.0, 0.0, 0.0, 10.0).toDF("v")
    val r = Stats.gini(conc, "v").head()
    assert(math.abs(r.getAs[Double]("gini") - 0.75) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean") - 2.5) < 1e-12)
    val neg = Seq(-1.0, 1.0, 2.0).toDF("v")
    assert(Stats.gini(neg, "v").head().getAs[Long]("n_negative") == 1L)
  }

  test("gini is bit-deterministic under repartitioning") {
    import sqlImplicits._
    val df = (1 to 400).map(i => ((i * 2654435761L) % 997).toDouble).toDF("v")
    val a = Stats.gini(df.coalesce(1), "v").head().toSeq
    val b = Stats.gini(df.repartition(13), "v").head().toSeq
    assert(a == b)
  }

  test("bandedCum matches a direct ordered window: grouped/global, multi-sum, carried totals, degenerate bands") {
    import sqlImplicits._
    import org.apache.spark.sql.expressions.Window
    // Direct differential certificate for the shared primitive every
    // banded consumer (KM, Gini, KS, MW, AUC, rank-normalize, lift,
    // calibration) rides: the banded prefix sums must equal the plain
    // ordered-window prefix sums for ANY band count, including the
    // degenerate bands=1 (everything in one band — pure in-band
    // window) and a hi==lo group (single distinct value). Ties are
    // pre-collapsed by contract (every consumer aggregates to the
    // (group, value) grain first), so __v is made unique per group.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (s"g${i % 4}", (i / 4) * 1.0 + (i % 4) * 0.13, rnd.nextInt(100).toLong, rnd.nextInt(50).toLong)
    } ++ Seq(("gone", 42.0, 7L, 3L)) // single-row group: hi == lo
    val df = rows.toDF("g", "__v", "a", "b").repartition(7)
    val win = Window.partitionBy(col("g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df
      .withColumn("ca", sum(col("a")).over(win))
      .withColumn("cb", sum(col("b")).over(win))
      .orderBy("g", "__v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(4), r.getLong(5))).toSeq
    for (bands <- Seq(1, 3, 64)) {
      val got = Stats.bandedCum(df, Seq("a" -> "ca", "b" -> "cb"), bands, Seq("g"),
          carryTotals = Seq("a" -> "ta"))
        .orderBy("g", "__v")
        .collect().map(r =>
          (r.getAs[String]("g"), r.getAs[Double]("__v"), r.getAs[Long]("ca"), r.getAs[Long]("cb"))).toSeq
      assert(got == expect, s"bands=$bands: banded prefix sums diverged from the direct window")
    }
    // carried totals equal the per-group grand total on every row
    val tots = Stats.bandedCum(df, Seq("a" -> "ca"), 8, Seq("g"), carryTotals = Seq("a" -> "ta"))
      .groupBy("g").agg(countDistinct(col("ta")).as("nd"), max(col("ta")).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val refTots = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._3).sum }
    assert(tots.forall { case (g, (nd, t)) => nd == 1L && t == refTots(g) },
      s"carried totals diverged: $tots vs $refTots")
    // global (no group columns) path
    val gGot = Stats.bandedCum(df.select(col("__v") + when(col("g") === "g1", 1000.0)
        .when(col("g") === "g2", 2000.0).when(col("g") === "g3", 3000.0)
        .when(col("g") === "gone", 4000.0).otherwise(0.0) as "__v", col("a")),
        Seq("a" -> "ca"), 16)
      .orderBy("__v").collect().map(r => r.getAs[Long]("ca")).toSeq
    assert(gGot == gGot.sorted && gGot.last == rows.map(_._3).sum,
      "global banded prefix must be monotone and end at the grand total")
  }

  test("bandedCumCore chained on a prior pass's retained banding equals an independent bandedCum") {
    import sqlImplicits._
    // The kaplanMeier fusion lemma (r14): a second prefix pass run via
    // bandedCumCore over a frame that RETAINS the first pass's __bkt
    // must equal a from-scratch bandedCum over the same rows — the
    // value domain is unchanged through windows and the offsets join,
    // so the banding (and with it every per-band sum, offset, and
    // in-band cumulative) is identical. A divergence here means the
    // fused two-pass operators (kaplanMeier) drifted from the
    // certified single-pass primitive.
    val rnd = new scala.util.Random(11)
    val df = (1 to 500).map(i => (i * 1.0, rnd.nextInt(90).toLong, rnd.nextInt(70).toLong))
      .toDF("__v", "a", "b").repartition(5)
    for (bands <- Seq(1, 4, 64)) {
      val first = Stats.bandedCum(df, Seq("a" -> "ca"), bands)
      val chained = Stats.bandedCumCore(first, Seq("b" -> "cb"),
          groupCols = Seq.empty, offsFit = true)
        .orderBy("__v").collect()
        .map(r => (r.getAs[Double]("__v"), r.getAs[Long]("ca"), r.getAs[Long]("cb"))).toSeq
      val direct = Stats.bandedCum(df, Seq("b" -> "cb"), bands)
        .orderBy("__v").collect()
        .map(r => (r.getAs[Double]("__v"), r.getAs[Long]("cb"))).toSeq
      assert(chained.map(t => (t._1, t._3)) == direct,
        s"bands=$bands: chained core pass diverged from an independent bandedCum")
      // and the first pass's own cumulatives survive the chaining intact
      val firstDirect = Stats.bandedCum(df, Seq("a" -> "ca"), bands)
        .orderBy("__v").collect()
        .map(r => (r.getAs[Double]("__v"), r.getAs[Long]("ca"))).toSeq
      assert(chained.map(t => (t._1, t._2)) == firstDirect,
        s"bands=$bands: the chained pass corrupted the first pass's cumulative")
    }
  }

  test("mannWhitneyU: a multi-million-row tie group does not wrap the variance term") {
    import sqlImplicits._
    // Σ(t³−t) cubed in LONGS wraps once one tied micro-value exceeds
    // ~2.09M observations; with identical single-valued sides the
    // exact variance is 0 and reject must be FALSE — the wrapped term
    // made σ² garbage and flipped the verdict
    val a = spark.range(2600000).select(lit(5.0).as("v"))
    val b = spark.range(2600000).select(lit(5.0).as("v"))
    val r = Stats.mannWhitneyU(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 2600000L)
    assert(!r.getAs[Boolean]("reject_05"),
      "identical distributions must never reject — the tie term wrapped")
  }

  test("gini: a large value times a large tie count does not wrap") {
    import sqlImplicits._
    // 1e9 value = 1e13 micro-units; tied across 1e6 rows the long
    // product v·c = 1e19 wrapped negative before the old cast could
    // protect it. A constant column is perfect equality: gini 0.
    val df = spark.range(1000000).select(lit(1.0e9).as("v"))
    val r = Stats.gini(df, "v").head()
    assert(math.abs(r.getAs[Double]("mean") - 1.0e9) < 1e-3, s"mean ${r.getAs[Double]("mean")}")
    assert(math.abs(r.getAs[Double]("gini")) < 1e-12, s"gini ${r.getAs[Double]("gini")}")
  }

  test("welch/ks exclude NaN values and raise on out-of-domain magnitudes") {
    import sqlImplicits._
    val a = (Seq(1.0, 2.0, 3.0, 4.0) ++ Seq(Double.NaN)).toDF("v")
    val b = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    // NaN previously counted in n while vanishing from the sums —
    // biased mean; now excluded like null
    val w = Stats.welchTTest(a, b, "v").head()
    assert(w.getAs[Long]("n_a") == 4L, s"NaN must not count, n_a=${w.getAs[Long]("n_a")}")
    assert(math.abs(w.getAs[Double]("mean_a") - 2.5) < 1e-9)
    val ks = Stats.ksTest(a, b, "v").head()
    assert(ks.getAs[Long]("n_a") == 4L && !ks.getAs[Boolean]("reject_05"))
    // a finite value outside the DECIMAL(18,4) domain raises instead
    // of silently quantizing to a phantom null micro-value
    val big = Seq(1.0, 1e15).toDF("v")
    intercept[Exception] { Stats.ksTest(big, b, "v").collect() }
  }

  test("bootstrapMeanCI: empty replicas cannot null-poison the order statistic") {
    import sqlImplicits._
    // a single-row frame: ~37% of the 32 deterministic replicas draw
    // weight 0 and have no mean. Their null 0/0 previously sorted
    // FIRST, so rank 2 (ci_lo) landed on a null even though plenty of
    // real replica means existed — now the order statistic runs over
    // the surviving replicas, all of which equal the single value.
    val df = Seq((1L, 42.0)).toDF("id", "v")
    val r = Stats.bootstrapMeanCI(df, "id", "v").head()
    assert(!r.isNullAt(r.fieldIndex("ci_lo")), "ci_lo must come from a surviving replica")
    assert(math.abs(r.getAs[Double]("ci_lo") - 42.0) < 1e-9)
  }

  test("mannWhitneyU and ksTest: billion-scale counts do not wrap the integer cores") {
    // a: 3.2e9 copies of 1.0; b: 2.4e9 of 1.0 + 0.8e9 of 2.0 — cheap
    // to generate (constant columns collapse map-side) but the exact
    // cores see real billion-scale counts. Pre-fix, the rank-sum term
    // ca·(2B+cnt+1) = 1.792e19 and the KS cross product cum_a·n_b =
    // 1.024e19 both wrapped Long silently. Exact answers: every a-b
    // comparison is a tie (U_a = ties/2 = 3.84e18) or a loss, and
    // D = |F_a(1) − F_b(1)| = 0.25 — both exactly representable.
    val a = spark.range(3200000000L).select(lit(1.0).as("v"))
    val b = spark.range(2400000000L).select(lit(1.0).as("v"))
      .unionAll(spark.range(800000000L).select(lit(2.0).as("v")))
    val mw = Stats.mannWhitneyU(a, b, "v").head()
    assert(mw.getAs[Long]("n_a") == 3200000000L && mw.getAs[Long]("n_b") == 3200000000L)
    assert(mw.getAs[Double]("u_a") == 3.84e18, s"u_a wrapped: ${mw.getAs[Double]("u_a")}")
    val ks = Stats.ksTest(a, b, "v").head()
    assert(ks.getAs[Double]("d") == 0.25, s"d wrapped: ${ks.getAs[Double]("d")}")
    assert(ks.getAs[Boolean]("reject_05"), "a 0.25 shift at n=3.2e9 must reject")
  }
}
