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
        (sum(round(term * lit(1e6)).cast("long")).cast("double") / lit(1e6)).as("chi2"))
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
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String, bands: Int = 64): DataFrame = {
    require(bands > 0, s"ksTest: bands must be positive, got $bands")
    def q(df: DataFrame, tag: String) = df
      .filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
        .multiply(lit(10000)).cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as(s"__c$tag"))
    val merged0 = q(a, "a").join(q(b, "b"), Seq("__v"), "full_outer")
      .select(
        col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    // band assignment by value range (min/max broadcast)
    val bounds = merged0.agg(
      min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val merged = merged0.crossJoin(broadcast(bounds))
      .withColumn(
        "__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(
            lit(bands - 1),
            floor((col("__v") - col("__lo")).cast("double") /
              ((col("__hi") - col("__lo")).cast("double") / lit(bands))).cast("int"))))
      .drop("__lo", "__hi")
    // phase 1: per-band totals → exclusive running offsets (≤ bands
    // rows; the window is tiny)
    val offs = merged.groupBy("__bkt")
      .agg(sum(col("__ca")).as("__sa"), sum(col("__cb")).as("__sb"))
      .withColumn(
        "__offa",
        coalesce(sum(col("__sa")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(
        "__offb",
        coalesce(sum(col("__sb")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__offa"), col("__offb"))
    // phase 2: per-band cumulative windows (parallel) + offsets
    val wb = Window.partitionBy(col("__bkt")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = merged.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val dnum = col("__dnum").cast("double")
    merged
      .join(broadcast(offs), Seq("__bkt"))
      .withColumn("__cuma", col("__offa") + sum(col("__ca")).over(wb))
      .withColumn("__cumb", col("__offb") + sum(col("__cb")).over(wb))
      .crossJoin(broadcast(tot))
      .agg(
        first(col("__na")).as("__na"),
        first(col("__nb")).as("__nb"),
        max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na"))).as("__dnum"))
      .select(
        col("__na").as("n_a"), col("__nb").as("n_b"),
        round(dnum / (na * nb), 6).as("d"),
        // c² as one decimal literal — both engines must parse the SAME
        // double (1.358*1.358 computed at runtime is one ulp off the
        // literal 1.844164)
        ((dnum / (na * nb)) * (dnum / (na * nb)) >
          lit(1.844164) * (na + nb) / (na * nb)).as("reject_05"))
  }
}
