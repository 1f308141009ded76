package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

class EvalSpec extends SparkSpec {

  // hand-checkable: g1 scores separate perfectly, g2 has a tie across
  // classes, g3 is all-positive (AUC undefined)
  private def scored = {
    import sqlImplicits._
    Seq(
      ("g1", true, 10L), ("g1", true, 9L), ("g1", false, 2L), ("g1", false, 1L),
      ("g2", true, 5L), ("g2", false, 5L), ("g2", true, 7L), ("g2", false, 3L),
      ("g3", true, 1L), ("g3", true, 2L))
      .toDF("g", "label", "score")
  }

  test("aucRank: perfect separation gives 1, cross-class tie gives half credit") {
    val out = Eval.aucRank(scored, Seq("g"), "label", "score")
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    // g1: every positive above every negative → u2 = 2·(2·2) = 8, auc 1
    assert(out(0) == ("g1", 2L, 2L, 8L, 1.0))
    // g2: pos {7,5} vs neg {5,3}: 7 beats both (2), 5 beats 3 and ties 5
    //     (1.5) → U = 3.5, u2 = 7, auc = 7/8 = 0.875
    assert(out(1) == ("g2", 2L, 2L, 7L, 0.875))
    // g3: no negatives → auc null
    assert(out(2)._1 == "g3" && out(2)._5.isNaN)
  }

  test("aucRank matches a brute-force pair count") {
    import sqlImplicits._
    // deterministic pseudo-random scores with deliberate tie collisions
    val rows = (1 to 200).map { i =>
      val score = (i * 2654435761L) % 37
      val label = (i * 97) % 5 != 0
      ("g", label, score)
    }
    val df = rows.toDF("g", "label", "score")
    val got = Eval.aucRank(df, Seq("g"), "label", "score").collect()(0)
    val pos = rows.filter(_._2).map(_._3)
    val neg = rows.filterNot(_._2).map(_._3)
    val u2 = (for { p <- pos; n <- neg } yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(got.getLong(1) == pos.size && got.getLong(2) == neg.size)
    assert(got.getLong(3) == u2)
  }

  test("aucRank: a NULL group key behaves exactly like a window partition") {
    import sqlImplicits._
    // the banded prefix joins its per-group bounds/offsets null-safely,
    // so a null group must keep its own rows together, not drop them
    val df = Seq(
      (Option("g"), true, 9L), (Option("g"), false, 1L),
      (Option.empty[String], true, 5L), (Option.empty[String], true, 7L),
      (Option.empty[String], false, 6L), (Option.empty[String], false, 2L))
      .toDF("g", "label", "score")
    val out = Eval.aucRank(df, Seq("g"), "label", "score")
      .orderBy(col("g").asc_nulls_first).collect()
    assert(out.length == 2)
    // null group: pos {5,7} vs neg {6,2}: 5>2, 7>6, 7>2 → U=3, u2=6
    assert(out(0).isNullAt(0) && out(0).getLong(3) == 6L &&
      out(0).getDouble(4) == 0.75)
    assert(out(1).getString(0) == "g" && out(1).getDouble(4) == 1.0)
  }

  test("aucRank: a single-score group exercises the hi==lo band guard") {
    import sqlImplicits._
    val df = Seq(("g", true, 5L), ("g", false, 5L), ("g", false, 5L),
      ("h", true, 3L), ("h", false, 1L))
      .toDF("g", "label", "score")
    val out = Eval.aucRank(df, Seq("g"), "label", "score")
      .orderBy("g").collect()
    // g: the lone positive ties both negatives → U = 1, u2 = 2, auc 0.5
    assert(out(0).getLong(3) == 2L && out(0).getDouble(4) == 0.5)
    assert(out(1).getDouble(4) == 1.0)
  }

  test("liftTable: tie-coherent buckets, exact counts, capture reaches 1") {
    import sqlImplicits._
    // 20 rows, scores 20..1 distinct, positives = top 5 scores
    val df = (1 to 20).map(i => (i > 15, i.toLong)).toDF("label", "score")
    val out = Eval.liftTable(df, "label", "score", nBuckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.map(_._2).toSeq == Seq(5L, 5L, 5L, 5L))
    // top bucket holds all 5 positives: lift = (5/5)/(5/20) = 4
    assert(out(0) == (1, 5L, 5L, 5L, 4.0, 1.0))
    assert(out(3) == (4, 5L, 0L, 5L, 0.0, 1.0))
  }

  test("liftTable: a tied run never straddles a bucket boundary") {
    import sqlImplicits._
    // 12 rows of one score + 8 distinct lower → with 4 buckets the
    // 12-run starts at rank 1 and must land whole in bucket 1
    val df = ((1 to 12).map(_ => (true, 100L)) ++ (1 to 8).map(i => (false, i.toLong)))
      .toDF("label", "score")
    val out = Eval.liftTable(df, "label", "score", nBuckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out(0) == (1, 12L, 12L))
    assert(out.map(_._2).sum == 20L)
  }

  test("calibrationBins: ascending bins, exact score sums, rates") {
    import sqlImplicits._
    // scores 1..20, positives are the top 5 scores
    val df = (1 to 20).map(i => (i > 15, i.toLong)).toDF("label", "score")
    val out = Eval.calibrationBins(df, "label", "score", nBins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // bin 1 = scores 1..5, bin 4 = scores 16..20 (all positive)
    assert(out(0) == (1, 5L, 0L, 15L, 0.0))
    assert(out(3) == (4, 5L, 5L, 90L, 1.0))
    assert(out.map(_._2).sum == 20L)
  }

  test("string scores take the direct-window path with one consistent lexicographic order") {
    import sqlImplicits._
    // the banding arithmetic is NUMERIC-only: pre-gate, a string score
    // was banded by its parsed value but ordered in-band
    // lexicographically — an inconsistent total order (and unparseable
    // strings all collapsed into the top band). Post-gate, strings rank
    // purely lexicographically, so a letter mapping that mirrors the
    // numeric order must reproduce the numeric metrics exactly.
    val letters = "abcdefghijklmnopqrst"
    val numeric = (1 to 20).map(i => (s"g${i % 2}", i > 15, i.toLong))
    val strs = numeric.map { case (g, l, s) => (g, l, letters(s.toInt - 1).toString) }
    val aucNum = Eval.aucRank(numeric.toDF("g", "label", "score"), Seq("g"), "label", "score")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(3), r.getDouble(4))).toSeq
    val aucStr = Eval.aucRank(strs.toDF("g", "label", "score"), Seq("g"), "label", "score")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(aucStr == aucNum, "lexicographic AUC must equal its order-isomorphic numeric twin")
    val liftNum = Eval.liftTable(numeric.map(t => (t._2, t._3)).toDF("label", "score"),
        "label", "score", nBuckets = 4)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val liftStr = Eval.liftTable(strs.map(t => (t._2, t._3)).toDF("label", "score"),
        "label", "score", nBuckets = 4)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(liftStr == liftNum, "lexicographic lift buckets must equal the numeric twin")
    // calibrationBins: same bins/counts (sum_score is null for strings —
    // a string corpus has no score sum; the integer columns must agree)
    val calNum = Eval.calibrationBins(numeric.map(t => (t._2, t._3)).toDF("label", "score"),
        "label", "score", nBins = 4)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val calStr = Eval.calibrationBins(strs.map(t => (t._2, t._3)).toDF("label", "score"),
        "label", "score", nBins = 4)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(calStr == calNum, "lexicographic calibration bins must equal the numeric twin")
  }

  test("date scores rank temporally through the direct-window gate (banding can't subtract dates)") {
    import sqlImplicits._
    // a recency ranker scores by date — DateType is not NumericType, so
    // the gate must route it to the window path (the banded arithmetic
    // (__v - __lo) / span is not defined on dates); temporal order is
    // the natural total order, so an epoch-day twin must agree exactly
    val days = (1 to 20).map(i => (s"g${i % 2}", i > 15, i))
    val dated = days.map { case (g, l, d) =>
      (g, l, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + d))) }
    val aucDate = Eval.aucRank(dated.toDF("g", "label", "score"), Seq("g"), "label", "score")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(3), r.getDouble(4))).toSeq
    val aucDay = Eval.aucRank(
        days.map(t => (t._1, t._2, t._3.toLong)).toDF("g", "label", "score"),
        Seq("g"), "label", "score")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(aucDate == aucDay, "date-scored AUC must equal its epoch-day numeric twin")
    // liftTable and calibrationBins accept the date score through the
    // same gate — calibrationBins previously died in ANALYSIS
    // (Spark's Sum rejects DateType) before its window branch was
    // even reached; sum_score is NULL for a date, the integer columns
    // must equal the epoch-day twin's
    val dDf = dated.map(t => (t._2, t._3)).toDF("label", "score")
    val nDf = days.map(t => (t._2, t._3.toLong)).toDF("label", "score")
    def ints(df: org.apache.spark.sql.DataFrame, ord: String) =
      df.orderBy(ord).collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ints(Eval.liftTable(dDf, "label", "score", nBuckets = 4), "bucket")
      == ints(Eval.liftTable(nDf, "label", "score", nBuckets = 4), "bucket"),
      "date-scored lift buckets must equal the epoch-day twin")
    val calDate = Eval.calibrationBins(dDf, "label", "score", nBins = 4)
    assert(ints(calDate, "bin")
      == ints(Eval.calibrationBins(nDf, "label", "score", nBins = 4), "bin"),
      "date-scored calibration bins must equal the epoch-day twin")
    assert(calDate.collect().forall(_.isNullAt(calDate.columns.indexOf("sum_score"))),
      "a date score has no meaningful sum — sum_score must be NULL, not an analysis error")
  }

  test("row-unique non-numeric scores fail the loud domain-cardinality guard, not a silent global sort") {
    // The non-numeric path's direct window is a one-task sort over the
    // distinct scores — sound ONLY for bounded vocabularies. A UUID-ish
    // row-unique string score must raise the named in-plan guard
    // instead of silently degrading into the single-task global sort
    // the window-scale lints exist to prevent.
    val n = graft.operators.Eval.MaxNonNumericScores + 8
    val wide = spark.range(0, n).selectExpr(
      "'g' AS g", "id % 2 = 0 AS label", "concat('u', id) AS score")
    def mustRaise(op: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[Exception](f.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("bounded-vocabulary") && m.contains(op)),
        s"$op must fail with its named cardinality guard, got: $e")
    }
    mustRaise("aucRank")(Eval.aucRank(wide, Seq("g"), "label", "score"))
    mustRaise("liftTable")(Eval.liftTable(wide, "label", "score"))
    mustRaise("calibrationBins")(Eval.calibrationBins(wide, "label", "score"))
    // the same cardinality on a NUMERIC score takes the banded path —
    // no guard, no global sort, exact results at any domain size
    val numWide = spark.range(0, n).selectExpr("id % 2 = 0 AS label", "id AS score")
    assert(Eval.liftTable(numWide, "label", "score")
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == n.toLong)
    // a caller that knowingly accepts the one-task sort can raise the
    // cap per session — the guard is a default contract, not a wall
    spark.conf.set("spark.graft.eval.maxNonNumericScores", n.toString)
    try {
      assert(Eval.liftTable(wide, "label", "score")
        .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == n.toLong,
        "a raised spark.graft.eval.maxNonNumericScores must admit the same domain")
    } finally spark.conf.unset("spark.graft.eval.maxNonNumericScores")
    // ... and once unset, the default cap raises again
    mustRaise("liftTable")(Eval.liftTable(wide, "label", "score"))
  }

  test("liftTable: billion-scale totals do not wrap the lift products") {
    // one constant score, every row positive: lift and capture are
    // exactly 1 in every bucket. Pre-fix, n_pos·tot_n = 1.024e19
    // wrapped Long and the ratio went garbage — silently, because the
    // wrapped numerator and denominator wrap DIFFERENTLY once bucket
    // counts diverge. Constant columns collapse map-side, so the
    // 3.2e9-row frame is cheap to scan.
    val df = spark.range(3200000000L)
      .select(lit(1.0).as("score"), lit(true).as("label"))
    val r = Eval.liftTable(df, "label", "score").head()
    assert(r.getAs[Long]("n") == 3200000000L)
    assert(r.getAs[Double]("lift") == 1.0, s"lift wrapped: ${r.getAs[Double]("lift")}")
    assert(r.getAs[Double]("capture") == 1.0)
  }
}
