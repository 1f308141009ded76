package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone-map (min/max footer statistics) computation and a
  * data-skipping audit — the small-materialized-aggregates idea
  * (Moerkotte, VLDB 1998; the stats every parquet footer carries).
  *
  * At 100 TB the scan you never run is the cheapest operator in the
  * engine: a WHERE clause prunes a zone (file / row group) whenever
  * the zone's [min, max] window is provably disjoint from the
  * predicate range. `stats` computes the per-zone windows with one
  * grouped aggregation (map-side combined — one row per zone per
  * partition crosses the wire); `pruneAudit` evaluates a CONJUNCTIVE
  * range predicate against them: a zone is skippable when ANY
  * conjunct is provably empty on it. Paired with [[ZOrder]], this
  * quantifies exactly how much scan a layout saves — the feedback
  * loop for choosing clustering columns.
  *
  * All comparisons are on the zone's own min/max values — no
  * approximation anywhere, so the audit is exactly SQL-replayable.
  */
object ZoneMap {

  /** Per-zone footer stats: `(zone, n_rows, min_<c>, max_<c>,
    * nn_<c> …)` for each stat column (`nn` = non-null count; a zone
    * with `nn = 0` is skippable for any predicate on `c`).
    */
  def stats(df: DataFrame, zone: Column, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "ZoneMap.stats: no stat columns")
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        count(col(c)).as(s"nn_$c"))
    }
    df.groupBy(zone.as("zone")).agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Merge zone-map STATES (the streaming-fold / cross-batch form):
    * rows with the same zone combine as sum/min/max/sum — every
    * component is associative + commutative, so any batch split folds
    * to the same state (the incremental footer-stats maintenance a
    * lakehouse table service runs on ingest).
    */
  def mergeStats(states: Seq[DataFrame], cols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "ZoneMap.mergeStats: no states")
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"),
        sum(col(s"nn_$c")).as(s"nn_$c"))
    }
    states.reduce(_ unionByName _)
      .groupBy(col("zone"))
      .agg(sum(col("n_rows")).as("n_rows"), aggs: _*)
  }

  /** Data-skipping audit for `AND`-ed range conjuncts
    * `(col, lo, hi)` (inclusive bounds; pass the same literal twice
    * for equality). Adds `skip_<c>` per conjunct and a combined
    * `skippable`; downstream sums give the pruning rate.
    */
  def pruneAudit(zoneStats: DataFrame, conjuncts: Seq[(String, Column, Column)]): DataFrame = {
    require(conjuncts.nonEmpty, "ZoneMap.pruneAudit: no conjuncts")
    val flagged = conjuncts.foldLeft(zoneStats) { case (acc, (c, lo, hi)) =>
      acc.withColumn(
        s"skip_$c",
        col(s"nn_$c") === 0L || col(s"max_$c") < lo || col(s"min_$c") > hi)
    }
    flagged.withColumn(
      "skippable",
      conjuncts.map(c => col(s"skip_${c._1}")).reduce(_ || _))
  }
}
