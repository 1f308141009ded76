package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Empirical scale probe: replicate the fixture tables K× with
  * deterministic decorrelating perturbations and time the heavy
  * operators at each multiplier — evidence that the shapes scale
  * linearly in rows (no hidden quadratic pair blowup).
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [multipliers csv]
  */
object ScaleProbe {

  /** K decorrelated document replicas: each replica rotates the
    * consonant alphabet differently, so token sets across replicas do
    * not overlap (no artificial near-dup pairs between replicas).
    */
  private def replicateDocs(docs: DataFrame, k: Int): DataFrame = {
    // full 26-letter rotation: distinct for k ≤ 26 (a 19-letter variant
    // wrapped at rep 19 and silently duplicated a replica)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    require(k <= alpha.length, s"replication factor $k exceeds distinct rotations")
    (0 until k).map { rep =>
      val to = alpha.drop(rep % alpha.length) + alpha.take(rep % alpha.length)
      docs.select(
        (col("doc_id") * k + rep).as("doc_id"),
        translate(col("text"), alpha, to).as("text"),
        col("lang"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  /** K perturbed embedding replicas (distinct vectors, same clusters). */
  private def replicateVecs(embeddings: DataFrame, k: Int): DataFrame =
    (0 until k).map { rep =>
      embeddings.select(
        (col("vec_id") * k + rep).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0f) + lit(rep.toFloat) * lit(0.003f) * cos(i.cast("double")).cast("float")))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

  /** Optional probe filter: SPARK_GRAFT_PROBE_ONLY=attribution,zipf
    * runs only probes whose label starts with one of the prefixes —
    * the bench's SPARK_GRAFT_ONLY convention, for isolated
    * adjudication re-runs.
    */
  private val probeOnly: Option[Seq[String]] =
    sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  /** True when a probe whose label starts with `prefix` is selected —
    * also the gate for a probe's SETUP block: the filter used to live
    * only inside time(), so an isolated adjudication re-run
    * (SPARK_GRAFT_PROBE_ONLY=attribution) still paid every excluded
    * probe's persists, bootstrap folds, and filesystem listings at
    * every multiplier.
    */
  private def probeEnabled(root: String): Boolean =
    // either direction: the env prefix may be shorter ("ann") or
    // longer ("ann_ivf_pq") than the setup block's label root ("ann_")
    probeOnly.forall(_.exists(p => root.startsWith(p) || p.startsWith(root)))

  private def time(label: String, df: => DataFrame): Unit = {
    if (probeOnly.exists(ps => !ps.exists(label.trim.startsWith))) return
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[probe] $label%-34s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,5,10").split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // Probe sittings drift like bench sittings (the r10/r11 series):
    // label this one with the same absolute anchor the bench carries,
    // so a slow probe row can be adjudicated against the interval
    // instead of re-run blind. The ref is parallelism-gated exactly
    // like Bench's (the probe is fixed work, so its wall-clock scales
    // with thread count): on a non-calibration thread count only the
    // raw seconds print — an index against the local[32] ref would be
    // misleading (the r11 ADVICE finding).
    val ysRef = Bench.yardstickRefFor(cpus)
    def ysLabel(ys: Double): String =
      if (ysRef > 0) f"(ref=$ysRef, index=${ys / ysRef}%.2f)"
      else s"(no index: thread count $cpus != calibration ${Bench.YardstickCalibCpus})"
    val ysPre = Bench.yardstick(spark)
    println(f"[probe] yardstick pre=$ysPre%.3f s ${ysLabel(ysPre)}")
    // second axis (the r14 Bench finding): bandwidth-class contention
    // is invisible to the CPU-bound yardstick — bracket probe sittings
    // with the same raw-seconds stream sample the bench ships as
    // `membw`, so probe rows adjudicate against both axes
    println(f"[probe] membw pre=${Bench.membwProbe()}%.4f s/GiB-pass")

    // setup gates for SPARK_GRAFT_PROBE_ONLY runs: the vector input
    // and the two heavy locally-blocks below only matter to their own
    // probes, so an isolated adjudication re-run skips their persists,
    // bootstrap folds, and listings entirely
    val vecProbes = Seq("ann_", "cosine_topk")
    for (k <- mults) {
      val d = replicateDocs(docs, k).repartition(cpus.toInt).persist()
      val v = replicateVecs(vecs, k).repartition(cpus.toInt).persist()
      d.count() // materialize inputs outside the timers
      if (vecProbes.exists(probeEnabled)) v.count()
      time(s"minhash_lsh_pairs      x$k", Dedup.minhashLshPairs(d, minEstJaccard = 0.5))
      time(s"ngram_jaccard_pairs    x$k", Dedup.ngramJaccardPairs(d))
      // dup-gram stats: window-df default vs the groupBy+join df cap —
      // the capped path must stay in the same cost class while being
      // immune to a single high-df gram straggler partition.
      time(s"ngram_dup_stats        x$k", Dedup.ngramDupStats(d))
      time(s"ngram_dup_stats_capped x$k", Dedup.ngramDupStats(d, maxGramDf = Some(1000L)))
      // Containment: same Σdf² inverted-index shape as Jaccard but no
      // length band — the curve tells whether the df cap must default on.
      time(s"ngram_containment      x$k", Dedup.ngramContainmentPairs(d))
      time(s"ngram_containment_cap  x$k", Dedup.ngramContainmentPairs(d, maxShingleDf = Some(1000L)))
      // Substring runs: positional-gram join — same inverted-index
      // class as containment, plus the per-(pair, diagonal) island
      // windows; the capped curve is the 100 TB configuration.
      time(s"substring_runs         x$k", Dedup.substringRunPairs(d))
      time(s"substring_runs_capped  x$k", Dedup.substringRunPairs(d, maxGramDf = Some(1000L)))
      time(s"simhash_pairs          x$k", Dedup.simhashPairs(d, maxHamming = 3))
      time(s"char_minhash_lsh_pairs x$k", Dedup.charMinhashLshPairs(d))
      time(s"ann_sign_lsh_topk      x$k", Similarity.annSignLshTopK(v))
      time(s"cosine_topk_bruteforce x$k", Similarity.cosineTopK(v))
      time(s"ann_ivf_kmeans         x$k", Similarity.ivfTopKKmeans(v))
      // PQ is an exhaustive ADC scan — same O(N·Q) class as the brute
      // baseline but m table-adds per score instead of dim multiplies
      // (compose with IVF cells when even that is too much).
      time(s"ann_pq                 x$k", Similarity.pqTopK(v))
      // IVF-PQ: the same ADC arithmetic restricted to probed cells —
      // this curve should flatten relative to ann_pq as K grows, since
      // each query scores nProbes/cells of the corpus.
      time(s"ann_ivf_pq             x$k", Similarity.ivfPqTopK(v))
      // Persisted-index lifecycle (x100/x197): the build cost is the
      // training + encode pass (linear in corpus), the probe reads the
      // stored cells/books/codes and scores only probed cells — the
      // curve must track the in-session ann_ivf_pq row plus a constant
      // write/read tax, never a second training.
      time(s"ann_index_lifecycle    x$k", {
        Similarity.buildIvfPqIndex(v, "probe_ann_idx", cells = 8, m = 8, codes = 16, maxIter = 2)
        Similarity.searchIvfPqIndex(
          v, v.filter(col("vec_id") % 100 === 0), "probe_ann_idx",
          k = 3, nProbes = 2, rerank = 32)
      })
      // drop the stored index artifacts after the timed block (the
      // spec suites' cleanup discipline) — a probe run must not leave
      // probe_ann_idx_* tables accreting in the warehouse
      Seq("cells", "books", "corpus", "meta").foreach(s =>
        graft.sources.Tables.dropManaged(v.sparkSession, s"probe_ann_idx_$s"))
      time(s"dedup_report_e2e       x$k", Dedup.dedupReport(d, minEstJaccard = 0.5))
      // Edit-distance verification in isolation (r14: banded at the
      // similarity bound): every doc paired with a lightly-REVISED
      // copy of itself (offset ids), so each candidate passes the
      // length prefilter and pays a REAL banded Levenshtein —
      // |candidates| grows linearly with K and the curve certifies
      // the per-candidate verify cost, independent of any LSH
      // generator's pair volume. rows ≈ |docs| (revisions stay above
      // the 0.8 bar on all but the shortest texts). Reading the
      // curve: near-linear ×1→×5; the ×10 column includes a one-time
      // plan-shape step — the docs-side text table outgrows the
      // broadcast threshold and the id joins degrade to shuffled
      // joins (measured ~1.3× over linear at the transition, then
      // back on the shuffle's own linear curve) — the documented
      // graceful-degradation class, not superlinear compute.
      time(s"edit_verify            x$k", {
        val off = lit(1000000000L)
        val revised = d.select((col("doc_id") + off).as("doc_id"),
          concat(lit("REV "), col("text")).as("text"))
        Dedup.editVerifiedPairs(
          d.select(col("doc_id").as("doc_a"), (col("doc_id") + off).as("doc_b")),
          d.select("doc_id", "text").unionByName(revised), minSimilarity = 0.8)
      })
      // Snapshot diff: value columns are digested before the join, so
      // the shuffle volume is keys+32B digests — the curve must track
      // row count, not row width.
      time(s"snapshot_diff          x$k", {
        val nw = d.filter(col("doc_id") % 13 =!= 0)
          .withColumn(
            "text",
            when(col("doc_id") % 11 === 0, concat(lit("REVISED "), col("text")))
              .otherwise(col("text")))
        graft.operators.SnapshotDiff.diff(d, nw, Seq("doc_id"))
      })
      // SCD2 merge: closed history never enters the join; cost is one
      // key join of the open slice against the staged batch.
      time(s"scd2_merge             x$k", {
        val cur = d.select(
          col("doc_id"), col("lang"),
          lit(java.sql.Date.valueOf("2024-01-01")).as("valid_from"),
          lit(null).cast("date").as("valid_to"),
          lit(true).as("is_current"))
        val upd = d.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), concat(col("lang"), lit("-x")).as("lang"))
        graft.operators.Scd2.merge(cur, upd, Seq("doc_id"), Seq("lang"),
          lit(java.sql.Date.valueOf("2024-06-01")))
      })
      // Decontamination at K× train volume vs a FIXED small test set
      // (the realistic shape: the corpus grows, the eval set doesn't).
      // bloom = broadcast-prune-then-verify; exact = plain semi-join.
      // The bloom path's advantage grows with K because non-matching
      // train shingles die at scan speed instead of shuffling.
      if (probeEnabled("bloom_decontaminate") || probeEnabled("exact_decontaminate")) locally {
        import graft.functions.TextFunctions.{tokens, wordShingles}
        // 5-grams: the fixture's tiny vocabulary makes 3-gram overlap
        // near-total (every train doc "contaminated" — nothing left to
        // prune); 5-grams give a realistic low match rate.
        def shingleDigests(src: DataFrame) = src
          .select(col("doc_id"), tokens(col("text")).as("__toks"))
          .select(col("doc_id"), explode(wordShingles(col("__toks"), 5)).as("g"))
          .select(col("doc_id"), md5(col("g")).as("gh"))
        val trainSh = shingleDigests(d)
        val testSh = shingleDigests(
          graft.operators.DataMix.md5Sample(docs, 0.05, Seq(col("doc_id"))))
          .select("gh").distinct().persist()
        testSh.count()
        time(s"bloom_decontaminate    x$k",
          Dedup.bloomSemiJoin(trainSh, testSh, "gh", expectedItems = 500000L)
            .select("doc_id").distinct())
        time(s"exact_decontaminate    x$k",
          trainSh.join(testSh, Seq("gh"), "left_semi").select("doc_id").distinct())
        testSh.unpersist()
      }
      // Near-dup decontamination at K× train volume vs the same fixed
      // eval set: the banded cross-corpus join must track train rows
      // (signature cost), not train×eval.
      time(s"neardup_decontaminate  x$k",
        Dedup.minhashLshPairsAcross(
          d, graft.operators.DataMix.md5Sample(docs, 0.05, Seq(col("doc_id")))))
      // Bounded top-k per group: shuffle width is ≤k·partitions rows
      // per group regardless of K, so the curve must track the SCAN,
      // not the group sizes.
      time(s"topk_per_group         x$k",
        graft.operators.TopK.topKPerGroup(d, Seq("lang"), "n_chars", "doc_id", 10))
      // Co-occurrence: anchor-explode keeps candidates at window·L —
      // the pair volume (and time) must grow linearly with K.
      time(s"cooccur_pairs          x$k",
        graft.operators.Cooccur.pairCounts(d, window = 2, minPairCount = 5L))
      // A-ES weighted sample: one scan + a k-bounded aggregate; the
      // curve is the scan curve.
      time(s"weighted_sample        x$k",
        graft.operators.DataMix.md5WeightedSample(
          d, 1000, "n_chars", "doc_id", Seq(col("doc_id"))))
      // Exact-threshold Jaccard set join: lossless prefix index —
      // candidate volume rides the rare-token postings, so the curve
      // must track pair volume, not corpus².
      time(s"jaccard_setjoin        x$k",
        graft.operators.SetJoin.jaccardJoin(
          graft.operators.DataMix.md5Sample(d, 0.25, Seq(col("doc_id"))), 0.5))
      // PageRank / triangles on a synthetic doc-similarity graph
      // (doc_id chain + modular shortcuts): per-round cost is one
      // edge join, so both curves must track |E| linearly.
      locally {
        val n = lit(5000L) * k
        val edges = graft.operators.PageRank.undirected(
          d.select(col("doc_id").as("src"), ((col("doc_id") + 1) % n).as("dst"))
            // i→i+2 chords close every consecutive triple into a
            // triangle, so the triangle probe counts real work
            .unionByName(d.select(col("doc_id").as("src"), ((col("doc_id") + 2) % n).as("dst")))
            .unionByName(d.select(col("doc_id").as("src"), (col("doc_id") % 97).as("dst"))))
        time(s"pagerank_5it           x$k", graft.operators.PageRank.ranks(edges, 5))
        time(s"triangles              x$k", graft.operators.Triangles.perNode(edges))
      }
      // Mergeable HLL over the token stream: one scan + a k-register
      // aggregate — the curve is the scan curve.
      time(s"hll_distinct           x$k",
        graft.operators.Hll.distinctByGroup(
          d.select(col("lang"),
            explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok")),
          Seq("lang"), "tok"))
      // Interval coalescing: synthetic per-key interval chains (1000
      // keys, 5-min steps, 8-min widths → long overlap islands); cost
      // is one shuffle + per-key sort.
      time(s"interval_coalesce      x$k",
        graft.operators.Intervals.coalesce(
          d.select(
            (col("doc_id") % 1000).as("key"),
            timestamp_micros(col("doc_id").divide(1000).cast("long") * 300000000L).as("s"),
            timestamp_micros(col("doc_id").divide(1000).cast("long") * 300000000L + 480000000L)
              .as("e")),
          Seq("key"), "s", "e"))
      // Market-basket pairs: K× baskets of CONSTANT size (doc_id
      // buckets of ~8 items) — pair volume and time must track basket
      // count linearly, never corpus².
      time(s"basket_pairs           x$k",
        graft.operators.Itemsets.pairStats(
          d.select((col("doc_id") / 8).cast("long").as("b"), (col("doc_id") % 157).as("it")),
          "b", "it", minSupport = 2L))
      // BPE training: the dictionary is vocabulary-sized (replica
      // alphabets rotate, so vocab grows ~linearly with K) but ROUNDS
      // are constant — the curve is one corpus scan + K_vocab-sized
      // round aggregates.
      time(s"bpe_train4             x$k",
        graft.operators.Bpe.train(d, k = 4).merges)
      // Skew profile: ONE per-key count shuffle + a broadcast 1-row
      // summary — the scan curve.
      time(s"skew_profile           x$k",
        graft.operators.Skew.profile(d, Seq("lang"), topK = 20))
      // CUSUM: one window sort per key + a struct argmax — the
      // sort-shuffle curve (synthetic event-time from doc_id).
      time(s"cusum_changepoint      x$k",
        graft.operators.Changepoint.cusum(
          d.select(col("lang"),
            timestamp_seconds(col("doc_id") % 1000000L).as("ts"),
            col("doc_id").as("id"), col("n_chars").cast("double").as("v")),
          Seq("lang"), "ts", "id", "v"))
      // Bitmap distinct on a dense K-scaled ID space: the shuffle
      // carries one word per occupied 64-ID block — the curve is the
      // scan, and must beat count(distinct)'s one-row-per-distinct
      // shuffle as density rises.
      time(s"bitmap_distinct        x$k",
        graft.operators.Bitmap.distinctByGroup(
          d.select(col("lang"), (col("doc_id") % (lit(100000L) * k)).as("uid")),
          Seq("lang"), "uid"))
      // Attribution: conversions×touches meet only inside a user key
      // (synthetic users of constant activity), so the join output is
      // linear in K.
      time(s"attribution            x$k",
        graft.operators.Behavior.attribution(
          d.select(
            // ~20 events per user at every K: per-user activity is the
            // bounded quantity; users scale with the corpus. The
            // modulus must NOT share a factor with the conversion
            // stride 5 (a multiple of 5 makes each user all-conversion
            // or all-touch and the probe vacuous) — 250·k+1 ≡ 1 mod 5
            // for every k, so residues always mix.
            (col("doc_id") % (lit(250L) * k + 1)).as("user_id"),
            when(col("doc_id") % 5 === 0, "buy").otherwise(
              concat(lit("ch"), (col("doc_id") % 3).cast("string"))).as("event_type"),
            timestamp_seconds(col("doc_id") % 86400L).as("ts"),
            col("doc_id").as("event_id")),
          "buy", lookbackSeconds = 86400L))
      // DSIR scores: two token-count aggregations + a vocab-sized
      // log-ratio join — the scan curve (vocab grows ~linearly with
      // the rotated replica alphabets).
      time(s"dsir_scores            x$k",
        graft.operators.Dsir.importanceScores(d, col("doc_id") % 10 === 0))
      // Seasonal MAD baseline: two aggregations on a BOUNDED slot key
      // (|langs|·168) — the scan curve.
      time(s"seasonal_mad           x$k",
        graft.operators.Seasonal.hourOfWeekAnomalies(
          d.select(col("lang").as("event_type"),
            timestamp_seconds(col("doc_id") % 604800L).as("ts"),
            col("n_chars").cast("double").as("value"))))
      // Sliding-window HLL: per-day sketches then ≤7-row register
      // merges per output day — time must track the daily aggregation
      // scan, never the window span.
      time(s"hll_sliding_7d         x$k",
        graft.operators.Hll.slidingDistinct(
          d.select(
            timestamp_seconds(lit(1704067200L) + (col("doc_id") % 90) * 86400L).as("ts"),
            (col("doc_id") % (lit(50000L) * k)).as("uid")),
          "ts", "uid", windowDays = 7))
      // Zipf OLS: one token-count aggregation + a ~topN-row window
      // behind the bounded pre-prune — the scan curve.
      time(s"zipf_slope             x$k",
        graft.operators.CorpusStats.zipfSlope(d, topN = 200))
      // Weighted quantile: ROW-UNIQUE value (continuous case — the
      // tie-collapsed table is row-sized), so the curve certifies the
      // banded per-group cumulative weights, not a bounded domain.
      time(s"weighted_quantile      x$k",
        graft.operators.RobustStats.weightedQuantile(
          d.select(col("lang"),
            (col("doc_id") * 1000 + col("n_chars")).cast("double").as("v"),
            ((col("doc_id") % 7) + 1).cast("double").as("w")),
          Seq("lang"), "v", "w"))
      // Grid-density clustering: points collapse to inhabited cells in
      // ONE aggregation; the star rounds run on the cell table only
      // (bounded by the inhabited area, not by K) — the scan curve.
      // 20×13 cell residues keep ~19 points/cell at ×1 (above minPts —
      // the probe must cluster REAL core cells at every K, not return
      // an empty frame) with density, not area, growing with K.
      time(s"grid_cluster           x$k",
        graft.operators.GridCluster.clusterReport(
          d.select(
            ((col("doc_id") % 20).cast("double") * 0.002).as("lat"),
            ((col("doc_id") % 13).cast("double") * 0.002).as("lng")),
          "lat", "lng", 2000L, 10L))
      // Kaplan–Meier: observations collapse to the distinct-duration
      // table (bounded domain here); both cumulative passes are banded
      // prefix sums — the scan curve, no global sort task.
      time(s"kaplan_meier           x$k",
        graft.operators.Stats.kaplanMeier(
          d.select((col("doc_id") % 10000).cast("double").as("dur"),
            (col("doc_id") % 3 === 0).cast("int").as("e")),
          "dur", "e"))
      // Poisson bootstrap: the ×32 replica explode IS the cost — the
      // curve is 32× the scan, reduced map-side to 32 rows.
      time(s"bootstrap_ci           x$k",
        graft.operators.Stats.bootstrapMeanCI(
          d.select(col("doc_id").as("id"), col("n_chars").cast("double").as("value")),
          "id", "value"))
      // Gini: collapsed distinct values + banded prefix — the
      // percentile-class curve.
      time(s"gini                   x$k",
        graft.operators.Stats.gini(
          d.select((col("n_chars") % 997).cast("double").as("v")), "v"))
      // Unigram KL: two token-count aggregations + one vocab-sized
      // outer join (vocab grows ~linearly with rotated replicas).
      time(s"kl_divergence          x$k",
        graft.operators.CorpusStats.klDivergence(
          d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 =!= 0)))
      // ACF: one window pass per bounded group + ONE aggregation.
      time(s"acf_lag5               x$k",
        graft.operators.Regression.acf(
          d.select(col("lang"), timestamp_seconds(col("doc_id") % 1000000L).as("ts"),
            col("doc_id").as("id"), col("n_chars").cast("double").as("v")),
          Seq("lang"), "ts", "id", "v", 5))
      // Readability: pure codegen scan with per-token regex counts.
      // Aggregate the scores — a bare projection would be pruned away
      // by count() and time nothing.
      time(s"readability            x$k",
        graft.operators.TextAnalysis.readability(d)
          .agg(sum(col("n_syllables")).as("syl"),
            sum(when(col("flesch") > 60.0, 1L).otherwise(0L)).as("easy")))
      // Rank-AUC / lift / calibration: the score is ROW-UNIQUE (a
      // continuous-score stand-in), so the distinct-score domain is
      // row-sized — exactly the shape the banded bandedCum rewrite
      // exists for. The curves must track the scan (every window
      // (group, band)-partitioned), never a one-task global sort.
      time(s"auc_rank               x$k",
        graft.operators.Eval.aucRank(
          d.select(col("lang"), (col("doc_id") % 2 === 0).as("y"),
            (col("doc_id") * 1000 + col("n_chars")).as("s")),
          Seq("lang"), "y", "s"))
      time(s"lift_gains             x$k",
        graft.operators.Eval.liftTable(
          d.select((col("doc_id") % 5 === 0).as("y"),
            (col("doc_id") * 1000 + col("n_chars")).as("s")),
          "y", "s"))
      time(s"calibration_bins       x$k",
        graft.operators.Eval.calibrationBins(
          d.select((col("doc_id") % 5 === 0).as("y"),
            (col("doc_id") * 1000 + col("n_chars")).as("s")),
          "y", "s"))
      // Stratified k-fold / sequence packing: 5 strata over the WHOLE
      // corpus — the shape where a per-stratum ORDER BY md5 window
      // would sort ~rows/5 in one task. The bandedMd5Prefix rank/
      // prefix-sum machinery must keep both on the scan curve.
      time(s"kfold                  x$k",
        graft.operators.DataMix.kfold(
            d.select(col("lang"), col("doc_id")), Seq(col("lang")), 5,
            Seq(col("doc_id")))
          .groupBy("lang", "fold").count())
      time(s"seq_packing            x$k",
        graft.operators.DataMix.packSequences(
            d.select(col("lang"), col("doc_id"),
              (col("n_chars") / 4 + 1).cast("long").as("n_tokens")),
            col("n_tokens"), 2048, col("lang"), Seq(col("doc_id")))
          .groupBy("lang").agg(countDistinct(col("bin_id")).as("n_bins")))
      // Per-group quota (r14: moved off its whole-group rank window
      // onto the banded rank) — same 5-strata whole-corpus shape as
      // kfold; must ride the same scan curve.
      time(s"md5_quota              x$k",
        graft.operators.DataMix.md5Quota(
            d.select(col("lang"), col("doc_id")), col("lang"), 1000,
            Seq(col("doc_id")))
          .groupBy("lang").count())
      // Gaps-and-islands: keyed window over per-key DISTINCT values
      // (bounded domain per key) — the keyed-shuffle scan curve.
      time(s"gaps_islands           x$k",
        graft.operators.Gaps.islandSummary(
          d.select((col("doc_id") % 4096).as("key"),
            ((col("doc_id") / 4096) % 1000).cast("long").as("v")),
          Seq("key"), "v"))
      // KMV: distinct-hash dedup then the bounded mergeable heap —
      // the shuffle carries ≤k rows per (group, map partition).
      time(s"kmv_distinct           x$k",
        graft.operators.Kmv.distinctSketch(d, Seq("lang"), "text", k = 256))
      // Clustering coefficient on the chain+chord graph class: one
      // degree aggregation on top of the triangle machinery — must
      // stay on the triangles curve.
      locally {
        val n = lit(5000L) * k
        val edges = d.select(col("doc_id").as("src"), ((col("doc_id") + 1) % n).as("dst"))
          .unionByName(d.select(col("doc_id").as("src"), ((col("doc_id") + 2) % n).as("dst")))
        time(s"clustering_coeff       x$k", graft.operators.Triangles.clusteringCoeff(edges))
      }
      // Sorted neighborhood: keyed sort within ~250 blocks; candidate
      // volume is exactly w·rows — linear by construction.
      time(s"sorted_neighborhood    x$k",
        graft.operators.RecordLinkage.sortedNeighborhood(
          d.withColumn("blk", concat(col("lang"), (col("n_chars") % 50).cast("string"))),
          "doc_id", substring(col("text"), 1, 24), col("blk"), w = 2))
      // CDC apply: the keyed window runs over the LOG ONLY (~16%
      // delta); the snapshot sees one anti-join + union — near-flat
      // in the base beyond the scan.
      time(s"cdc_apply              x$k", {
        val base = d.select(col("doc_id").as("k2"), col("lang"), col("n_chars"))
        val log = base.filter(col("k2") % 10 === 0)
          .select(col("k2"), col("lang"), (col("n_chars") + 1).as("n_chars"),
            lit("U").as("op"), lit(1L).as("ord"))
          .unionByName(base.filter(col("k2") % 17 === 0)
            .select(col("k2"), col("lang"), col("n_chars"),
              lit("D").as("op"), lit(2L).as("ord")))
        graft.operators.Cdc.applyLog(base, log, Seq("k2"), "op", Seq("ord"))
      })
      // Mutual information: one contingency aggregation (cell table
      // is vocab²-bounded) + broadcast margins — the scan curve.
      time(s"mutual_info            x$k",
        graft.operators.MlPrep.mutualInfo(
          d.select(col("lang"), (col("n_chars") % 20).as("b")), "lang", "b"))
      // Rank normalization: ROW-UNIQUE numeric value (continuous
      // case) — the distinct-value grain is row-sized, so the curve
      // certifies the banded per-group prefixes, not a bounded domain.
      time(s"rank_normalize         x$k",
        graft.operators.MlPrep.rankNormalize(
          d.select(col("lang"),
            (col("doc_id") * 1000 + col("n_chars")).as("v")), Seq("lang"), "v"))
      // Streaming CDC bucketed fold: the snapshot grows K× while the
      // delta stays CONSTANT and SMALL (10 keys — at 64 buckets ~54
      // buckets stay untouched, so the probe exercises partition
      // pruning rather than a full rewrite; a 1000-key delta would
      // touch every bucket with overwhelming probability and the
      // curve would only reflect fixed overhead). The timed fold must
      // track the touched buckets (delta-sized partition-pruned read
      // + per-bucket publish), not the snapshot; the r6 full-rewrite
      // finding would show here as a linear-in-K curve. Timed block
      // excludes the batch-0 bootstrap (that one IS snapshot-sized by
      // contract). Untouched-bucket byte-identity is ASSERTED (the
      // StreamingSpec check, repeated at probe scale): a pruning
      // regression fails the probe, not just bends the curve.
      if (probeEnabled("cdc_fold_bucketed")) locally {
        val state = "probe_cdc_state"
        Seq("", "__staging", "__wm", "__touched")
          .foreach(x => graft.sources.Tables.dropManaged(spark, state + x))
        val base = d.select(col("doc_id").as("k2"), col("lang"), col("n_chars"))
        graft.streaming.EventStreams.foldSnapshotBatch(
          base.withColumn("op", lit("I")).withColumn("ord", lit(0L)),
          0L, state, Seq("k2"), "op", Seq("ord"))
        val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $state")
          .filter(col("col_name") === "Location").head().getString(1).stripPrefix("file:")
        def bucketFiles(): Map[String, Set[String]] = {
          val root = new java.io.File(loc)
          root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
            .map { dir =>
              dir.getName -> dir.listFiles().filter(_.getName.endsWith(".parquet"))
                .map(f => f.getName + ":" + f.lastModified()).toSet
            }.toMap
        }
        val before = bucketFiles()
        val delta = base.filter(col("k2") < 10)
          .select(col("k2"), col("lang"), (col("n_chars") + 1).as("n_chars"),
            lit("U").as("op"), lit(1L).as("ord"))
        time(s"cdc_fold_bucketed      x$k", {
          graft.streaming.EventStreams.foldSnapshotBatch(
            delta, 1L, state, Seq("k2"), "op", Seq("ord"))
          spark.table(state + "__wm")
        })
        val after = bucketFiles()
        // the fold's OWN bucket expression at the table's PINNED
        // modulus — a hand-copied pmod(xxhash64, 64) here would
        // silently diverge if the fold's hash or default ever changed,
        // mislabeling rewritten buckets as untouched (or vice versa)
        val pinnedN = spark.sessionState.catalog
          .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(state))
          .properties("graft.nbuckets").toInt
        val touched = delta
          .select(graft.streaming.EventStreams.bucketOf(Seq("k2"), pinnedN)
            .cast("int").as("b"))
          .distinct().collect().map(r => "__bucket=" + r.getInt(0)).toSet
        val rewritten = before.keySet.filterNot(touched).filter(b => after(b) != before(b))
        require(rewritten.isEmpty,
          s"cdc_fold_bucketed: untouched buckets rewritten (pruning regression): $rewritten")
        Seq("", "__staging", "__wm", "__touched")
          .foreach(x => graft.sources.Tables.dropManaged(spark, state + x))
      }
      // Rolling correlation: the series is DOMAIN-sized (50k ticks at
      // every K) by contract — aggregation tracks the scan, the frame
      // pass is constant.
      time(s"rolling_corr           x$k",
        graft.operators.Regression.rollingCorr(
          d.groupBy((col("doc_id") % 50000).as("t"))
            .agg(sum(col("n_chars") % 100).as("x"), sum(col("n_chars") % 97).as("y")),
          Seq.empty, "t", "x", "y", 24))
      d.unpersist(); v.unpersist()
    }
    val ysPost = Bench.yardstick(spark)
    println(f"[probe] yardstick post=$ysPost%.3f s ${ysLabel(ysPost)}")
    println(f"[probe] membw post=${Bench.membwProbe()}%.4f s/GiB-pass")
    spark.stop()
  }
}
