package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact classical statistical tests as engine operators — the
  * inference tier above the descriptive screens (x121 PSI, x151
  * drift): is this association / distribution shift real?
  *
  * Both tests are computed from integer counts so the arithmetic is
  * engine-portable: terms are micro-quantized before any unordered
  * sum (the repo's portable-score convention), and verdicts compare
  * doubles derived from the same integers by the same expression
  * tree on both sides.
  */
object Stats {

  /** BANDED two-phase INCLUSIVE prefix sums over rows ordered by
    * `__v`, optionally per `groupCols` group: per-(group, band)
    * cumulative windows run in parallel and a (groups × bands)-sized
    * offset table lifts them to per-group cumulative sums — the
    * distributed ordered-scan primitive (no sort task ever sees a
    * whole group's value domain). `sums` maps input count column →
    * output cumulative column name. Group keys join null-safely, so a
    * null group behaves exactly like a window PARTITION BY would.
    * `carryTotals` (input column → total column) rides per-(group-)
    * total sums on the SAME bounds pass, sparing callers that also
    * need totals a second aggregate lineage over `df`.
    */
  private[graft] def bandedCum(
      df: DataFrame,
      sums: Seq[(String, String)],
      bands: Int,
      groupCols: Seq[String] = Seq.empty,
      carryTotals: Seq[(String, String)] = Seq.empty): DataFrame = {
    val gc = groupCols.map(col)
    val boundAggs = Seq(min(col("__v")).as("__lo"), max(col("__v")).as("__hi")) ++
      carryTotals.map { case (c, out) => sum(col(c)).as(out) }
    // The offset table's own stats are useless (agg over join over
    // window estimates as if nothing reduced — the planner would pick
    // a sort-merge join and shuffle+SORT the whole row-sized frame on
    // the join key, re-buying a good chunk of the global sort this
    // primitive exists to avoid). Its row count IS provably bounded:
    // ≤ min(bands·|groups|, |df|) — and Catalyst's size estimate for
    // the BOUNDS aggregate is already ≥ |df|'s width-scaled size
    // (default estimation never shrinks row counts through an
    // aggregate), so "bounds fits the broadcast threshold" is a sound,
    // conservative bound for the offset table too. Past the threshold
    // (huge group counts) fall back to a shuffled HASH join: correct
    // distribution, no big-side sort. DESIGN NOTE: the explicit
    // broadcast() hint trusts that never-shrinking Catalyst estimate
    // and removes the planner's option to back out at runtime — a
    // source with absent/shrinking stats could in principle estimate
    // under the threshold while the true bounds frame is larger, and
    // the driver would still have to collect it. Accepted: the bounds
    // frame is an aggregate of THIS primitive's own input (never an
    // exotic source directly), and the estimate is conservative by
    // construction for aggregates; callers feeding a pre-aggregated
    // frame with hand-tuned stats own that contract.
    var offsFit = false
    val withBounds =
      if (groupCols.isEmpty) {
        offsFit = true // ≤ bands rows, unconditionally
        df.crossJoin(broadcast(df.agg(boundAggs.head, boundAggs.tail: _*)))
      } else {
        // per-group bounds via map-side-combined agg + null-safe join —
        // NOT a per-group window, which would re-create the one-task-
        // per-whole-group sort this primitive exists to avoid
        val bounds = df.groupBy(gc: _*)
          .agg(boundAggs.head, boundAggs.tail: _*)
          .select(groupCols.map(c => col(c).as(s"__bg_$c")) ++
            (Seq(col("__lo"), col("__hi")) ++
              carryTotals.map { case (_, out) => col(out) }): _*)
        offsFit = Broadcasting.fitsBroadcast(bounds)
        df.join(
            // same no-big-side-sort rule as the offsets join below
            if (offsFit) broadcast(bounds) else bounds.hint("shuffle_hash"),
            groupCols.map(c => col(c) <=> col(s"__bg_$c")).reduce(_ && _))
          .drop(groupCols.map(c => s"__bg_$c"): _*)
      }
    bandedCumCore(withBand(withBounds, bands), sums, groupCols, offsFit)
  }

  /** The banding expression shared by [[bandedCum]] and the fused
    * multi-pass callers ([[kaplanMeier]]): adds `__bkt` from the
    * joined `__lo`/`__hi` bounds and drops them. ONE definition — a
    * second copy drifting by an ulp would band the same row into
    * different buckets across passes.
    */
  private def withBand(withBounds: DataFrame, bands: Int): DataFrame =
    withBounds
      .withColumn(
        "__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(
            lit(bands - 1),
            floor((col("__v") - col("__lo")).cast("double") /
              ((col("__hi") - col("__lo")).cast("double") / lit(bands))).cast("int"))))
      .drop("__lo", "__hi")

  /** Post-banding half of [[bandedCum]]: per-(group, band) partial
    * sums, the ≤ bands·|groups|-row offset table, and the in-band
    * cumulative windows, over a frame that ALREADY carries `__bkt`.
    * Exposed (package-private) so a caller chaining SEVERAL prefix
    * passes over the same value domain ([[kaplanMeier]]: at-risk
    * countdown, then ln-term prefix) bands once and reuses the
    * banding — the second pass's per-band aggregate and final window
    * then reuse the `__bkt` hash partitioning already established by
    * the first pass's window instead of re-deriving bounds (a full
    * re-aggregation of the first pass's whole subtree) and
    * re-shuffling. `offsFit` mirrors the bounds-fit decision of the
    * banding caller: broadcast the offset table when it provably
    * fits, shuffled-hash join otherwise (never sort-merge — the
    * big-side sort is what this primitive exists to avoid).
    */
  private[graft] def bandedCumCore(
      banded: DataFrame,
      sums: Seq[(String, String)],
      groupCols: Seq[String],
      offsFit: Boolean,
      reuseEstablished: Boolean = false): DataFrame = {
    val gc = groupCols.map(col)
    val keys = gc :+ col("__bkt")
    def offsSide(offs: DataFrame): DataFrame =
      if (offsFit) broadcast(offs) else offs.hint("shuffle_hash")
    // WINDOW-FIRST form (r14): ONE explicit (group, band) exchange
    // feeds the whole core — the in-band cumulative windows and the
    // per-band offset aggregate both read it (ReuseExchange dedupes,
    // and the aggregate's required distribution is exactly satisfied,
    // so it runs as a single hash aggregate with no exchange of its
    // own). The previous join-back form referenced `banded` from TWO
    // lineages (the offsets aggregate and the final window), so the
    // banded input subtree EXECUTED twice — for ksTest/mannWhitneyU
    // that subtree is the whole full-outer merge of the two sides.
    // The repartition is 1:1 the exchange the window used to insert
    // (same keys, same partition count, AQE-coalescible), and it now
    // carries banded's columns only: the offsets join moved ABOVE the
    // window, so the per-band offset columns no longer ride the
    // shuffle. `reuseEstablished` skips the repartition when the
    // caller's frame already carries the (group, band) hash
    // partitioning (kaplanMeier's chained second pass).
    val part = if (reuseEstablished) banded else banded.repartition(keys: _*)
    val wb = Window.partitionBy(keys: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sums.foldLeft(part) { case (acc, (c, _)) =>
      acc.withColumn(s"__ib$c", sum(col(c)).over(wb))
    }
    val sumAggs = sums.map { case (c, _) => sum(col(c)).as(s"__s$c") }
    val offs = part.groupBy(keys: _*).agg(sumAggs.head, sumAggs.tail: _*)
    // offset window: ≤ bands rows per group, partitioned by group
    val offW = Window.partitionBy(gc: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    if (groupCols.isEmpty) {
      val withOffs = sums.foldLeft(offs) { case (acc, (c, _)) =>
        acc.withColumn(s"__off$c", coalesce(sum(col(s"__s$c")).over(offW), lit(0L)))
      }.select(col("__bkt") +: sums.map { case (c, _) => col(s"__off$c") }: _*)
      // outputs first, ONE drop after: dropping __ib inside the fold
      // would break a caller carrying the same input column under two
      // output names (the second output's __ib would already be gone)
      sums.foldLeft(cum.join(broadcast(withOffs), Seq("__bkt"))) {
        case (acc, (c, out)) =>
          acc.withColumn(out, col(s"__off$c") + col(s"__ib$c"))
      }.drop(sums.map { case (c, _) => s"__ib$c" }.distinct: _*)
    } else {
      val withOffs = sums.foldLeft(offs) { case (acc, (c, _)) =>
        acc.withColumn(s"__off$c", coalesce(sum(col(s"__s$c")).over(offW), lit(0L)))
      }.select(
        groupCols.map(c => col(c).as(s"__og_$c")) ++
          (col("__bkt").as("__obkt") +:
            sums.map { case (c, _) => col(s"__off$c") }): _*)
      val joined = cum.join(
          offsSide(withOffs),
          (groupCols.map(c => col(c) <=> col(s"__og_$c")) :+
            (col("__bkt") === col("__obkt"))).reduce(_ && _))
        .drop(groupCols.map(c => s"__og_$c") :+ "__obkt": _*)
      sums.foldLeft(joined) { case (acc, (c, out)) =>
        acc.withColumn(out, col(s"__off$c") + col(s"__ib$c"))
      }.drop(sums.map { case (c, _) => s"__ib$c" }.distinct: _*)
    }
  }

  /** Pearson chi-square test of independence between two categorical
    * columns. Expected counts e_ij = r_i·c_j/N from the margins; each
    * cell's (n−e)²/e is micro-quantized, so the statistic is an exact
    * integer sum under any aggregation order. Output one row:
    * (n, n_rows_cat, n_cols_cat, dof, chi2).
    *
    * Scale shape: one (a, b) count aggregation (map-side combined);
    * margins derive from the cell table (category-cardinality-sized,
    * broadcast).
    */
  def chi2Independence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rowTot = cells.groupBy("__a").agg(sum(col("__n")).as("__r"))
    val colTot = cells.groupBy("__b").agg(sum(col("__n")).as("__c"))
    val tot = cells.agg(
      sum(col("__n")).as("__t"),
      countDistinct(col("__a")).as("__ka"),
      countDistinct(col("__b")).as("__kb"))
    val e = col("__r").cast("double") * col("__c").cast("double") / col("__t").cast("double")
    val term = (col("__n").cast("double") - e) * (col("__n").cast("double") - e) / e
    cells
      .join(Broadcasting.maybeBroadcast(rowTot), Seq("__a"))
      .join(Broadcasting.maybeBroadcast(colTot), Seq("__b"))
      .crossJoin(broadcast(tot))
      .agg(
        first(col("__t")).as("n"),
        first(col("__ka")).cast("int").as("n_rows_cat"),
        first(col("__kb")).cast("int").as("n_cols_cat"),
        ((first(col("__ka")) - 1) * (first(col("__kb")) - 1)).cast("int").as("dof"),
        // micro-terms summed in DECIMAL: chi2 can reach N·(min k − 1),
        // so at trillion-row scale a single micro-term exceeds Long and
        // the long cast CLAMPS (non-ANSI) — silently deflating chi2
        (sum(round(term * lit(1e6)).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / lit(1e6)).as("chi2"))
  }

  /** Two-sample Kolmogorov–Smirnov test. The statistic is computed
    * exactly in integers: per distinct value v (micro-quantized
    * through DECIMAL — the ewma convention), D·n_a·n_b =
    * max |cum_a(v)·n_b − cum_b(v)·n_a|. The α=0.05 verdict uses the
    * large-sample critical value c=1.358: reject iff
    * D² > c²·(n_a+n_b)/(n_a·n_b), compared via doubles derived from
    * the same integers on both engines. Output one row:
    * (n_a, n_b, d, reject_05).
    *
    * The ordered scan runs over the DISTINCT quantized values
    * (collapsed first — ties never split a step), as a BANDED
    * two-phase prefix sum: per-band cumulative windows run in
    * parallel, and a band-count-sized offset table (broadcast) lifts
    * them to global cumulative counts — no global sort task ever
    * sees the full value domain.
    */
  /** Shared micro-quantization domain guard for the statistical
    * reductions: NaN carries no order or mean information and is
    * excluded like null, while a FINITE value outside the
    * DECIMAL(18,4) quantization domain (±Inf included) RAISES — the
    * IncrementalAgg convention. Such rows previously quantized to
    * null SILENTLY: they stayed in the row counts while vanishing
    * from the sums (biased means and variances) and survived as a
    * phantom null micro-value in the rank tests' banded curves.
    */
  private[operators] def quantizable(df: DataFrame, valueCol: String, op: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull && !isnan(v))
      .withColumn("__qchk", assert_true(
        v.cast(org.apache.spark.sql.types.DecimalType(18, 4)).isNotNull,
        concat(lit(s"$op: value outside the DECIMAL(18,4) quantization domain: "),
          v.cast("string"))))
      .filter(col("__qchk").isNull)
      .drop("__qchk")
  }

  def ksTest(a: DataFrame, b: DataFrame, valueCol: String, bands: Int = 64): DataFrame = {
    require(bands > 0, s"ksTest: bands must be positive, got $bands")
    def q(df: DataFrame, tag: String) = quantizable(df, valueCol, "ksTest")
      .select(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
        .multiply(lit(10000)).cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as(s"__c$tag"))
    val aAgg = q(a, "a")
    val bAgg = q(b, "b")
    val merged = aAgg.join(bAgg, Seq("__v"), "full_outer")
      .select(
        col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    // bounds + totals from the two PRE-JOIN side aggregates (r14):
    // each side is exchange-terminated, so these 1-row aggregates
    // reuse the sides' shuffles — deriving them from `merged` (the
    // old carryTotals path) re-executed the whole full-outer join a
    // second time just to read min/max/sums. Identities: least/
    // greatest skip an empty side's null min/max exactly like the
    // joined aggregate did; each side's total equals the joined sum
    // of its coalesced counts (full outer keeps every row), with
    // coalesce pinning the empty-side total to the same 0 the joined
    // sum of zero-fills produced.
    val bounds = aAgg
      .agg(min(col("__v")).as("__loa"), max(col("__v")).as("__hia"),
        sum(col("__ca")).as("__ta"))
      .crossJoin(bAgg.agg(min(col("__v")).as("__lob"), max(col("__v")).as("__hib"),
        sum(col("__cb")).as("__tb")))
      .select(
        least(col("__loa"), col("__lob")).as("__lo"),
        greatest(col("__hia"), col("__hib")).as("__hi"),
        coalesce(col("__ta"), lit(0L)).as("__na"),
        coalesce(col("__tb"), lit(0L)).as("__nb"))
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val dnum = col("__dnum").cast("double")
    bandedCumCore(
        withBand(merged.crossJoin(broadcast(bounds)), bands),
        Seq("__ca" -> "__cuma", "__cb" -> "__cumb"),
        groupCols = Seq.empty, offsFit = true)
      .agg(
        first(col("__na")).as("__na"),
        first(col("__nb")).as("__nb"),
        // cross products in DECIMAL: cum_a·n_b approaches n_a·n_b,
        // which wraps Long once both sides pass ~3e9 observations (the
        // 100 TB regime) — and identical wrapped products cancel, so
        // the corruption is silent, not loud
        max(abs(
          col("__cuma").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__nb") -
            col("__cumb").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__na")))
          .as("__dnum"))
      .select(
        col("__na").as("n_a"), col("__nb").as("n_b"),
        round(dnum / (na * nb), 6).as("d"),
        // c² as one decimal literal — both engines must parse the SAME
        // double (1.358*1.358 computed at runtime is one ulp off the
        // literal 1.844164)
        ((dnum / (na * nb)) * (dnum / (na * nb)) >
          lit(1.844164) * (na + nb) / (na * nb)).as("reject_05"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) test — the median-shift
    * companion of [[ksTest]], robust where KS reacts to any shape
    * difference. Exact integer core over the collapsed micro-values:
    * with cumBefore(v) = #observations below v, each tied group's
    * doubled average rank is 2·cumBefore + cnt + 1, so
    * 2·R_a = Σ ca·(2·cumBefore + cnt + 1) and
    * 2·U_a = 2·R_a − n_a(n_a+1) are exact integers. The normal-
    * approximation verdict uses the tie-corrected variance
    * σ² = n_a·n_b/12·((N+1) − Σ(t³−t)/(N(N−1))) and compares
    * (2U − n_a·n_b)² > 4·z²·σ² — all doubles derived from the same
    * integers on both engines, no sqrt anywhere.
    * Output: (n_a, n_b, u_a, reject_05). Same banded prefix-sum
    * machinery as KS — no global sort task.
    */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valueCol: String, bands: Int = 64): DataFrame = {
    require(bands > 0, s"mannWhitneyU: bands must be positive, got $bands")
    def q(df: DataFrame, tag: String) = quantizable(df, valueCol, "mannWhitneyU")
      .select(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
        .multiply(lit(10000)).cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as(s"__c$tag"))
    val aAgg = q(a, "a")
    val bAgg = q(b, "b")
    val merged = aAgg.join(bAgg, Seq("__v"), "full_outer")
      .select(
        col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .withColumn("__cnt", col("__ca") + col("__cb"))
    // bounds from the two PRE-JOIN side aggregates — the ksTest
    // rationale: the bandedCum bounds pass re-executed the full-outer
    // join just to read min/max; least/greatest over the per-side
    // bounds skip an empty side's nulls exactly like the joined
    // aggregate did (totals are not needed here — they ride the big
    // aggregate below)
    val bounds = aAgg
      .agg(min(col("__v")).as("__loa"), max(col("__v")).as("__hia"))
      .crossJoin(bAgg.agg(min(col("__v")).as("__lob"), max(col("__v")).as("__hib")))
      .select(
        least(col("__loa"), col("__lob")).as("__lo"),
        greatest(col("__hia"), col("__hib")).as("__hi"))
    val cum = bandedCumCore(
        withBand(merged.crossJoin(broadcast(bounds)), bands),
        Seq("__cnt" -> "__cumn"), groupCols = Seq.empty, offsFit = true)
      .withColumn("__before", col("__cumn") - col("__cnt"))
    val agg = cum.agg(
      sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"),
      // 2·R_a term in DECIMAL: ca·(2·before + cnt + 1) approaches
      // 2·n_a·N per tie group, which wraps Long once the corpus passes
      // ~3e9 observations — the same silent-wrap class as the tie cube
      // below (r13), one product earlier in the statistic
      sum(col("__ca").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
        (lit(2L) * col("__before") + col("__cnt") + lit(1L))).as("__r2a"),
      // tie term Σ(t³−t) for the variance correction — cubed in
      // DECIMAL: the long cube silently wrapped once any single tied
      // micro-value held more than ~2.09M observations (cnt³ >
      // Long.MaxValue), corrupting σ² and the verdict with no error
      sum {
        val cntD = col("__cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        cntD * cntD * cntD - cntD
      }.as("__ties"))
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val nn = na + nb
    // 2·U_a exact integer — n_a·(n_a+1) in DECIMAL too (wraps Long at
    // n_a ≈ 3e9, the same regime as the rank sum above)
    val u2 = col("__r2a") -
      col("__na").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
        (col("__na") + lit(1L))
    val sigma2 = na * nb / lit(12.0) *
      ((nn + lit(1.0)) - col("__ties").cast("double") / (nn * (nn - lit(1.0))))
    // |U − μ| > z·σ ⟺ (2U − n_a·n_b)² > 4·z²·σ²; z² = 3.8416 literal
    agg.select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      (u2.cast("double") / lit(2.0)).as("u_a"),
      ((u2.cast("double") - na * nb) * (u2.cast("double") - na * nb) >
        lit(4.0) * lit(3.8416) * sigma2).as("reject_05"))
  }

  /** Welch's unequal-variance t-test — the parametric mean-shift
    * companion of [[mannWhitneyU]] (which tests rank shift) and
    * [[ksTest]] (any shape difference). Each side reduces to the
    * exact integer moments (n, Σu, Σu²) over 1e-4-unit quantized
    * values in ONE map-side-combined aggregation — no window, no
    * sort, nothing but two scans and a 1×1 cross of 1-row frames.
    * Sample means/variances, t² and the Welch–Satterthwaite df are
    * then doubles derived from the same integers by the same
    * expression trees on both engines. The α=0.05 verdict is the
    * large-sample normal one (t² > z²_{.975} = 3.8416 — the regime
    * this engine runs in; at the df this corpus produces the
    * t-critical value agrees to 3 decimals). Output one row:
    * (n_a, n_b, mean_a, mean_b, t2, df_welch, reject_05).
    */
  def welchTTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def m(df: DataFrame, tag: String) = {
      val u = Regression.toUnits(col(valueCol))
      // quantizable, not a bare isNotNull: a NaN/overflowing value
      // quantized to a null __u — counted in n but skipped by Σu/Σu²,
      // silently biasing mean, variance and the verdict
      quantizable(df, valueCol, "welchTTest")
        .select(u.as("__u"))
        .agg(
          count(lit(1)).as(s"__n$tag"),
          sum(col("__u")).cast("double").as(s"__s$tag"),
          sum((col("__u") * col("__u")).cast(DecimalType(38, 0)))
            .cast("double").as(s"__q$tag"))
    }
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val ma = col("__sa") / na
    val mb = col("__sb") / nb
    // unbiased sample variance from exact sums: (n·Q − S²)/(n·(n−1))
    val va = (na * col("__qa") - col("__sa") * col("__sa")) / (na * (na - lit(1.0)))
    val vb = (nb * col("__qb") - col("__sb") * col("__sb")) / (nb * (nb - lit(1.0)))
    val sea = va / na
    val seb = vb / nb
    val se2 = sea + seb
    val t2 = (ma - mb) * (ma - mb) / se2
    val dfw = se2 * se2 / (sea * sea / (na - lit(1.0)) + seb * seb / (nb - lit(1.0)))
    m(a, "a").crossJoin(m(b, "b"))
      .select(
        col("__na").as("n_a"), col("__nb").as("n_b"),
        (ma / lit(1e4)).as("mean_a"), (mb / lit(1e4)).as("mean_b"),
        t2.as("t2"), dfw.as("df_welch"),
        (t2 > lit(3.8416)).as("reject_05"))
  }

  /** Kaplan–Meier survival over (duration, event) observations — the
    * time-to-event curve (activation lag, churn timing, failure life)
    * with right-censoring done correctly: a user who never converted
    * still holds the at-risk set open until their censoring time.
    * At each distinct duration t_i (1e-4-unit quantized):
    * n_i = #(duration ≥ t_i) at risk, d_i events, c_i censored, and
    * the log-survival ln S(t_i) = Σ_{t_j ≤ t_i} ln((n_j − d_j)/n_j),
    * each term micro-nat quantized BEFORE its prefix sum, so the
    * reported `ln_surv_micro` is an exact integer under any
    * aggregation order (hash-exact; S = exp(ln_surv_micro/1e6) when a
    * probability is wanted — deliberately left to the caller, since
    * exp's final ulp is not portable across engines).
    *
    * Scale shape: observations collapse to the distinct-duration
    * table first; both cumulative passes (at-risk countdown, ln-term
    * prefix) run as BANDED two-phase prefix sums — no global sort
    * task ever sees the full duration domain.
    * Output: (t, n_risk, d, c, ln_surv_micro) — the CURVE is ordered
    * by t semantically, but rows arrive in band-partition order like
    * any unsorted DataFrame; order by t downstream when presenting
    * (a final global sort here would tax every consumer that only
    * aggregates).
    */
  def kaplanMeier(
      df: DataFrame, durationCol: String, eventCol: String, bands: Int = 64): DataFrame = {
    require(bands > 0, s"kaplanMeier: bands must be positive, got $bands")
    val collapsed = quantizable(df, durationCol, "kaplanMeier")
      .filter(col(eventCol).isNotNull)
      .select(
        Regression.toUnits(col(durationCol)).cast("long").as("__v"),
        when(col(eventCol).cast("boolean"), 1L).otherwise(0L).as("__e"))
      .groupBy("__v")
      .agg(sum(col("__e")).as("__d"), sum(lit(1L) - col("__e")).as("__c"))
      .withColumn("__dc", col("__d") + col("__c"))
    // the observation total rides this one bounds aggregate (a
    // separate tot lineage would re-scan collapsed's final stage).
    // BAND ONCE for both prefix passes (r14): the second pass's value
    // domain is the first's (windows and the broadcast offsets join
    // preserve rows 1:1 and never touch __v), so re-deriving bounds
    // there re-aggregated the ENTIRE first pass's subtree just to
    // recompute the identical __bkt — and the re-banding exchange
    // threw away the (__bkt) hash partitioning the first pass's
    // window had already established. The fused form hands the
    // retained banding to [[bandedCumCore]] twice: same lo/hi, same
    // __bkt per row, bit-identical cumulatives.
    val bounds = collapsed.agg(
      min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
      sum(col("__dc")).as("__tot"))
    val banded = withBand(collapsed.crossJoin(broadcast(bounds)), bands)
    val atRisk = bandedCumCore(banded, Seq("__dc" -> "__cumdc"),
        groupCols = Seq.empty, offsFit = true)
      .withColumn("__n", col("__tot") - (col("__cumdc") - col("__dc")))
    // ln((n−d)/n) in micro-nats; d = 0 ⇒ ln 1 = 0 exactly, so every
    // row carries a term and ONE prefix sum covers the whole domain.
    // n = d (S hits 0, ln = −∞) can ONLY be the final duration (it
    // forces c = 0 and empties the at-risk set), so zeroing ITS term
    // and nulling its own output loses nothing downstream.
    val terms = atRisk.withColumn(
      "__t",
      when(col("__n") > col("__d"),
        round(log((col("__n") - col("__d")).cast("double") / col("__n").cast("double")) *
          lit(1e6)).cast("long"))
        .otherwise(lit(0L)))
    bandedCumCore(
      terms.select(
        col("__v"), col("__bkt"), col("__n"), col("__d"), col("__c"), col("__t")),
      Seq("__t" -> "__lnsurv"), groupCols = Seq.empty, offsFit = true,
      // pass 1's repartition + broadcast offsets join preserve the
      // (__bkt) hash partitioning 1:1 — skip the second repartition
      reuseEstablished = true)
      .select(
        (col("__v").cast("double") / lit(1e4)).as("t"),
        col("__n").as("n_risk"), col("__d").as("d"), col("__c").as("c"),
        when(col("__n") === col("__d"), null).otherwise(col("__lnsurv"))
          .as("ln_surv_micro"))
  }

  /** Gini concentration coefficient of a non-negative measure — the
    * inequality audit ("what share of spend sits on the top keys?")
    * complementing the count-based [[Skew]] profile. Exact integer
    * core over the collapsed distinct micro-values: with c_v copies
    * of value u_v and B_v values strictly below (banded prefix sum —
    * no global sort task), Σ_i(2i−n−1)·x_(i) telescopes per tie group
    * to Σ_v u_v·c_v·(2B_v + c_v − n), and G = that over n·Σu — one
    * double division of two exact integers. Negative inputs break the
    * [0,1) range, so their count is reported rather than silently
    * folded in. Output one row: (n, n_negative, mean, gini).
    */
  def gini(df: DataFrame, valueCol: String, bands: Int = 64): DataFrame = {
    require(bands > 0, s"gini: bands must be positive, got $bands")
    import org.apache.spark.sql.types.DecimalType
    val u = Regression.toUnits(col(valueCol)).cast("long")
    val collapsed = quantizable(df, valueCol, "gini")
      .select(u.as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__c"))
    val cum = bandedCum(collapsed, Seq("__c" -> "__cumc"), bands)
      .withColumn("__b", col("__cumc") - col("__c"))
    // v·c multiplied in DECIMAL from the first factor: the long
    // product wrapped BEFORE the old cast could protect it (a 1e13
    // micro-value tied across ~1e6 keys overflows Long), silently
    // corrupting mean and gini
    val vc = col("__v").cast(DecimalType(38, 0)) * col("__c")
    cum
      .agg(
        sum(col("__c")).as("__n"),
        sum(when(col("__v") < 0, col("__c")).otherwise(0L)).as("n_negative"),
        sum(vc).as("__s"),
        sum(vc * (lit(2L) * col("__b") + col("__c")).cast(DecimalType(38, 0)))
          .as("__num_part"))
      .select(
        col("__n").as("n"), col("n_negative"),
        (col("__s").cast("double") / col("__n").cast("double") / lit(1e4)).as("mean"),
        ((col("__num_part").cast("double") -
          col("__n").cast("double") * col("__s").cast("double")) /
          (col("__n").cast("double") * col("__s").cast("double"))).as("gini"))
  }

  /** Cumulative Poisson(1) CDF P(X ≤ k), k = 0..7 — double literals
    * shared verbatim with the generated oracle SQL so both engines
    * compare against bit-identical thresholds.
    */
  private[graft] val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** Per-(row, replica) deterministic Poisson(1) bootstrap weight:
    * u = first 6 md5 nibbles of (id ∥ ':' ∥ rep) as a 24-bit uniform,
    * w = #{k : u ≥ cdf_k} — distributed Poisson(1) capped at 8, the
    * standard Poisson bootstrap approximation of multinomial
    * resampling (exchangeable at corpus scale, and embarrassingly
    * parallel: no draw ever needs to know n).
    */
  private def poissonWeight(id: Column, rep: Column): Column = {
    def nib(h: Column, i: Int) = instr(lit("0123456789abcdef"), substring(h, i, 1)) - 1
    val h = md5(concat(id.cast("string"), lit(":"), rep.cast("string")))
    val v = (0 until 6).map(i => nib(h, i + 1) * lit(1 << (4 * (5 - i)))).reduce(_ + _)
    val u = v.cast("double") / lit((1 << 24).toDouble)
    poissonCdf.map(c => when(u >= lit(c), 1L).otherwise(0L)).reduce(_ + _)
  }

  /** Deterministic Poisson-bootstrap confidence interval for the mean
    * of `valueCol`: `b` replicas, each row entering replica r with
    * weight [[poissonWeight]](id, r); replica means are exact-integer
    * weighted sums (1e-4 units) with one double division, and the CI
    * is the EXACT (loRank-th, hiRank-th) order statistic of the `b`
    * replica means — no interpolation, no normality assumption. With
    * the defaults (b=32, ranks 2/31) that is a ~93.75% interval.
    * Output one row: (b, n, mean_point, ci_lo, ci_hi).
    *
    * Scale shape: the replica explode multiplies the scan by `b`, but
    * everything reduces in ONE map-side-combined aggregation to `b`
    * rows; the order statistic runs on a b-row frame. No per-row
    * state, no window over the corpus, no collect.
    */
  def bootstrapMeanCI(
      df: DataFrame, idCol: String, valueCol: String,
      b: Int = 32, loRank: Int = 2, hiRank: Int = 31): DataFrame = {
    require(b >= 4 && b <= 1024, s"bootstrapMeanCI: b=$b out of [4, 1024]")
    require(1 <= loRank && loRank < hiRank && hiRank <= b,
      s"bootstrapMeanCI: ranks ($loRank, $hiRank) invalid for b=$b")
    val u = Regression.toUnits(col(valueCol))
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).as("__id"), u.as("__u"))
    val exact = base.agg(
      count(lit(1)).as("__n"), sum(col("__u")).cast("double").as("__s"))
    val w = poissonWeight(col("__id"), col("__rep"))
    val reps = base
      .select(col("__id"), col("__u"), explode(sequence(lit(0), lit(b - 1))).as("__rep"))
      .select(col("__rep"), col("__u"), w.as("__w"))
      .groupBy("__rep")
      .agg(
        sum(col("__w")).as("__wn"),
        sum((col("__w") * col("__u")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double").as("__ws"))
      // a replica whose every draw is weight 0 (possible only for
      // tiny n: P ≈ 0.368^n per replica) has no mean — its null
      // 0/0 previously sorted FIRST under row_number and shifted (or
      // nulled) the order-statistic CI; excluded, with the order
      // statistic over the surviving replicas
      .filter(col("__wn") > 0)
      .select((col("__ws") / col("__wn").cast("double")).as("__m"))
    val ranked = reps.withColumn(
      "__rk", row_number().over(Window.orderBy(col("__m"))))
    ranked
      .agg(
        max(when(col("__rk") === loRank, col("__m"))).as("__lo"),
        max(when(col("__rk") === hiRank, col("__m"))).as("__hi"))
      .crossJoin(broadcast(exact))
      .select(
        lit(b).as("b"), col("__n").as("n"),
        (col("__s") / col("__n").cast("double") / lit(1e4)).as("mean_point"),
        (col("__lo") / lit(1e4)).as("ci_lo"),
        (col("__hi") / lit(1e4)).as("ci_hi"))
  }
}
