package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
  * 1969, public) — entity resolution for STRUCTURED records, the
  * sibling of the text near-dup family: block, compare fields, sum
  * log-likelihood-ratio weights, threshold.
  *
  * Portability by construction: the per-field weights ln(m/u) and
  * ln((1−m)/(1−u)) are computed ONCE on the driver and quantized to
  * integer micro-nats, so both the Spark plan and any SQL replay sum
  * the SAME integer literals — no transcendental ever evaluates
  * inside a query. Scale shape: candidate generation is a blocked
  * equi-join (the LSH shape — never left×right), scoring is row-local
  * arithmetic, classification a filter.
  */
object RecordLinkage {

  /** A field comparison: `agree` references the prefixed columns
    * (`l_<col>` / `r_<col>`) of the candidate frame; (m, u) are the
    * match/unmatch agreement probabilities.
    */
  final case class FieldSpec(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u, s"FieldSpec($name): need 0 < u < m < 1")
    val wAgreeMicro: Long = math.round(math.log(m / u) * 1e6)
    val wDisagreeMicro: Long = math.round(math.log((1 - m) / (1 - u)) * 1e6)
  }

  /** Candidate pairs via the block join: every non-block column is
    * prefixed `l_` / `r_`; block columns keep their names.
    */
  def candidates(left: DataFrame, right: DataFrame, blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "RecordLinkage: at least one block column")
    def prefixed(df: DataFrame, p: String) =
      df.columns.foldLeft(df)((d, c) =>
        if (blockCols.contains(c)) d else d.withColumnRenamed(c, s"$p$c"))
    prefixed(left, "l_").join(prefixed(right, "r_"), blockCols)
  }

  /** Score candidates: adds `agree_<field>` bits, `score_micro` (the
    * exact integer weight sum) and `is_match` at `thresholdMicro`.
    */
  def score(cand: DataFrame, fields: Seq[FieldSpec], thresholdMicro: Long): DataFrame = {
    require(fields.nonEmpty, "RecordLinkage: at least one field")
    // Fellegi–Sunter missing-value handling: a NULL comparison (one
    // side unobserved) carries NO evidence — weight 0 — and its agree
    // bit is NULL, distinguishable from a real disagreement. The old
    // when().otherwise() sent null predicates to the DISAGREE weight,
    // so a true match with one missing field was charged ~−2.3e6
    // micro-nats as if the fields were observed and differed, and
    // silently dropped below threshold.
    val bits = fields.map(f =>
      when(f.agree.isNull, lit(null).cast("int"))
        .when(f.agree, 1).otherwise(0).as(s"agree_${f.name}"))
    val scoreMicro = fields
      .map(f => when(f.agree.isNull, lit(0L))
        .when(f.agree, lit(f.wAgreeMicro)).otherwise(lit(f.wDisagreeMicro)))
      .reduce(_ + _)
    cand
      .select(cand.columns.map(col) ++ bits :+ scoreMicro.as("score_micro"): _*)
      .withColumn("is_match", col("score_micro") >= thresholdMicro)
  }

  /** The full pipeline: block → compare → classify. */
  def link(
      left: DataFrame, right: DataFrame, blockCols: Seq[String],
      fields: Seq[FieldSpec], thresholdMicro: Long): DataFrame =
    score(candidates(left, right, blockCols), fields, thresholdMicro)

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo
    * 1995): records sorted by `sortKey`; each record pairs with its
    * `w` successors in that order. This is the BLOCKED variant — the
    * sort runs within `blockCol` partitions, so the window is keyed
    * (one hash shuffle, no single global sort task) and cross-block
    * neighbors are by contract not candidates; run further passes
    * with different (block, key) choices to recover them (standard
    * multi-pass SN). Ties in `sortKey` are totalized by `idCol` asc,
    * making the neighbor sets deterministic under any partitioning.
    * Output: (block, id_a, id_b, key_a, key_b, offset) with
    * offset ∈ [1, w] the rank distance a→b.
    */
  def sortedNeighborhood(
      df: DataFrame,
      idCol: String,
      sortKey: Column,
      blockCol: Column,
      w: Int): DataFrame = {
    require(w >= 1 && w <= 100, s"sortedNeighborhood: w=$w out of [1, 100]")
    // a NULL block key is a record the blocking scheme cannot place —
    // the window would otherwise gather EVERY null-block record into
    // one partition, pairing unrelated records and concentrating the
    // sort into a single oversized task
    val base = df.filter(blockCol.isNotNull)
      .select(blockCol.as("block"), sortKey.as("key_a"), col(idCol).as("id_a"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("block"))
      .orderBy(col("key_a").asc, col("id_a").asc)
    // windows first (a generator cannot host window expressions),
    // explode second
    val withLeads = base.select(
      col("block"), col("id_a"), col("key_a"),
      array((1 to w).map(i =>
        struct(
          lead(col("id_a"), i).over(win).as("id_b"),
          lead(col("key_a"), i).over(win).as("key_b"))): _*).as("__next"))
    withLeads
      .select(col("block"), col("id_a"), col("key_a"), posexplode(col("__next")))
      .select(
        col("block"), col("id_a"), col("col.id_b").as("id_b"),
        col("key_a"), col("col.key_b").as("key_b"),
        (col("pos") + 1).cast("int").as("offset"))
      .filter(col("id_b").isNotNull)
  }

  /** Multi-pass sorted neighborhood (the published contract of
    * Hernández & Stolfo 1995 §4.2: several independent passes with
    * DIFFERENT (block, key) choices, candidate sets union-deduped) —
    * one pass misses every true pair its blocking key splits apart;
    * a second pass with a rotated key recovers them. Pairs are
    * normalized to id_a < id_b before the dedup so the same pair
    * found a→b in one pass and b→a in another collapses.
    * Scale shape: each pass is one keyed-window shuffle (see
    * [[sortedNeighborhood]]); the dedup groupBy runs over the pair
    * sets (w·n rows per pass), never the records.
    * Output: (id_a, id_b, n_passes, first_pass).
    */
  def sortedNeighborhoodMultiPass(
      df: DataFrame,
      idCol: String,
      passes: Seq[(Column, Column)], // (sortKey, blockCol) per pass
      w: Int): DataFrame = {
    require(passes.nonEmpty, "sortedNeighborhoodMultiPass: at least one pass")
    passes.zipWithIndex
      .map { case ((key, blk), i) =>
        sortedNeighborhood(df, idCol, key, blk, w)
          .select(
            least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"),
            lit(i).as("pass"))
      }
      .reduce(_ unionByName _)
      .groupBy("id_a", "id_b")
      .agg(
        countDistinct(col("pass")).as("n_passes"),
        min(col("pass")).as("first_pass"))
  }
}
