package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (similarity-search extensions).
  *
  * Scale design (100 TB / 1000-executor target):
  *  - the query set is an EXTERNAL DataFrame (the `queryMod` overloads
  *    are test conveniences that slice the corpus); it is broadcast
  *    only while its optimizer-estimated size fits the session
  *    broadcast threshold — above that the candidate joins degrade
  *    gracefully to shuffled equi-joins instead of blowing the
  *    broadcast limit;
  *  - norms are computed once per row before any join (never inside);
  *  - the LSH variant buckets both sides on sign-LSH signature bands
  *    so each corpus row is compared only to queries sharing a band —
  *    the bucket join is an equi-join on (band_id, band_key) carrying
  *    IDS ONLY; vectors are re-attached after the candidate pairs are
  *    deduplicated, so no shuffle ever carries array payloads per
  *    candidate pair.
  */
object Similarity {

  /** Corpus with per-row double vector + norm precomputed, cached:
    * every operator here reads it at least twice (corpus + query side),
    * and the norm fold is an interpreted higher-order function — pay
    * it once per row, not once per reference.
    */
  private def prepared(embeddings: DataFrame, site: String): DataFrame =
    OpCache.swap(site,
      embeddings.select(
        col("vec_id"),
        toDoubleVec(col("embedding")).as("vec"))
        .withColumn("norm", l2norm(col("vec"))))

  /** An external query set is not guaranteed small — a forced
    * broadcast hint would grow with it linearly; past the threshold,
    * the unhinted plan falls back to a shuffled hash / sort-merge join
    * on the bucket keys.
    */
  private def maybeBroadcast(df: DataFrame): DataFrame = Broadcasting.maybeBroadcast(df)

  /** Brute-force exact cosine top-k: every query row against the full
    * corpus (the recall baseline the ANN variants are measured
    * against). Self-pairs excluded by id.
    * Output: (query_id, neighbor_id, cosine, rank) — rank 1..k.
    */
  def cosineTopK(embeddings: DataFrame, k: Int = 3, queryMod: Int = 100,
      site: String = "sim.cosine.prep"): DataFrame =
    cosineTopK(embeddings, embeddings.filter(col("vec_id") % queryMod === 0), k, site)

  /** External-query-set form: `queries` has the corpus shape
    * (vec_id, embedding). Brute force is inherently all-pairs — the
    * query side should be small; above the broadcast threshold the
    * planner falls back to a nested-loop join.
    */
  def cosineTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      site: String): DataFrame = {
    val corpus = prepared(embeddings, site)
    val qprep = prepared(queries, site + ".q")
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))

    val scored = corpus
      .join(maybeBroadcast(qprep), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        cosineWithNorms(dot(col("vec"), col("qvec")), col("norm"), col("qnorm")).as("cosine"))

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** Sign-LSH bucketed ANN top-k: both sides get an nPlanes-bit
    * hyperplane signature split into `bands`; candidates are rows
    * sharing ≥1 band with a query. Exact cosine is then computed only
    * on candidates. Recall < 1 by construction; precision is exact.
    * Output: (query_id, neighbor_id, cosine, rank).
    */
  def annSignLshTopK(
      embeddings: DataFrame,
      k: Int = 3,
      queryMod: Int = 100,
      nPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = 64): DataFrame =
    annSignLshTopK(embeddings, embeddings.filter(col("vec_id") % queryMod === 0),
      k, nPlanes, bands, dim)

  /** External-query-set form. The banded candidate join carries ids
    * only; vectors are re-attached AFTER the (query_id, neighbor_id)
    * pairs are deduplicated, so neither the bucket join nor the dedup
    * shuffle moves array payloads.
    */
  def annSignLshTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nPlanes: Int,
      bands: Int,
      dim: Int): DataFrame = {
    val base = OpCache.swap("sim.lsh.sig",
      prepared(embeddings, "sim.lsh.prep")
        .withColumn("sig", signLshSignature(col("vec"), nPlanes, dim)))
    val qbase = OpCache.swap("sim.lsh.qsig",
      prepared(queries, "sim.lsh.qprep")
        .select(col("vec_id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
        .withColumn("qsig", signLshSignature(col("qvec"), nPlanes, dim)))

    val corpusB = base.select(
      col("vec_id"),
      posexplode(array(signatureBands(col("sig"), nPlanes, bands): _*)).as(Seq("band_id", "band_key")))
    val queriesB = qbase.select(
      col("query_id"),
      posexplode(array(signatureBands(col("qsig"), nPlanes, bands): _*)).as(Seq("band_id", "band_key")))

    val candidates = corpusB
      .join(maybeBroadcast(queriesB), Seq("band_id", "band_key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id") // collided in >1 band; two-long rows

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .join(base.select(col("vec_id").as("neighbor_id"), col("vec"), col("norm")), Seq("neighbor_id"))
      .join(maybeBroadcast(qbase.select(col("query_id"), col("qvec"), col("qnorm"))), Seq("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosineWithNorms(dot(col("vec"), col("qvec")), col("norm"), col("qnorm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** IVF (inverted-file) ANN top-k: the corpus is partitioned into
    * cells around centroids; queries probe only the `nProbes` nearest
    * cells. Centroids here are per-`centroidCol` mean vectors (one
    * k-means assignment step with provided coarse labels — swap in
    * k-means rounds to productionize). Scale shape: the centroid table
    * is tiny and broadcast twice (assignment + probe); the candidate
    * join is an equi-join on cell id, so each corpus row is compared
    * only to queries probing its cell.
    * Output: (query_id, neighbor_id, cosine, rank).
    */
  def ivfTopK(
      embeddings: DataFrame,
      k: Int = 3,
      queryMod: Int = 100,
      nProbes: Int = 2,
      centroidCol: String = "label"): DataFrame =
    ivfTopK(embeddings, embeddings.filter(col("vec_id") % queryMod === 0),
      k, nProbes, centroidCol)

  /** External-query-set form of [[ivfTopK]]. */
  def ivfTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbes: Int,
      centroidCol: String): DataFrame = {
    val base = prepared(embeddings.select(col("vec_id"), col("embedding"), col(centroidCol)), "sim.ivf.prep")

    // Per-cell mean vector via positional explode → elementwise avg →
    // re-assembled in position order (deterministic).
    val centroids = OpCache.swap("sim.ivf.centroids",
      embeddings
        .select(col(centroidCol).as("cell"), posexplode(toDoubleVec(col("embedding"))).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), e => e.getField("m")).as("cvec"))
        .withColumn("cnorm", l2norm(col("cvec"))))

    ivfSearch(prepared(queries.select("vec_id", "embedding"), "sim.ivf.qprep"),
      base, centroids, k, nProbes)
  }

  /** IVF ANN with centroids learned by Lloyd's k-means instead of
    * provided coarse labels — the productionized variant. Each round
    * is one broadcast-assign plus one single-shuffle recompute through
    * the [[graft.functions.VectorMean]] typed aggregate (map-side
    * partial element-wise sums — the shuffle carries k partial
    * vectors per partition, never the corpus). Deterministic
    * hash-order seeding; lineage truncated per round. At 100 TB,
    * seed from a sample (k-means|| style) instead of a global sort.
    */
  def ivfTopKKmeans(
      embeddings: DataFrame,
      k: Int = 3,
      queryMod: Int = 100,
      nProbes: Int = 2,
      cells: Int = 8,
      maxIter: Int = 3): DataFrame =
    ivfTopKKmeans(embeddings, embeddings.filter(col("vec_id") % queryMod === 0),
      k, nProbes, cells, maxIter)

  /** External-query-set form of [[ivfTopKKmeans]]. */
  def ivfTopKKmeans(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbes: Int,
      cells: Int,
      maxIter: Int): DataFrame = {
    val base = prepared(embeddings.select(col("vec_id"), col("embedding")), "sim.kmeans.prep")
    // Memoized on the exact input plan: the Lloyd loop is EAGER
    // (localCheckpoint per round), so an OpCache swap would arrive
    // after the work is already redone — the memo short-circuits the
    // recompute itself. The cached value is the tiny checkpointed
    // centroid table (k rows). Keyed on semanticHash + a sameResult
    // confirmation (a plan STRING can truncate via maxToStringFields
    // and collide two different inputs onto one cached result).
    val plan = base.queryExecution.analyzed
    val key = (base.sparkSession, plan.semanticHash(), cells, maxIter)
    val centroids = kmeansMemo.get(key) match {
      case Some((storedPlan, df)) if storedPlan.sameResult(plan) => df
      case _ =>
        val df = kmeansCentroids(base, cells, maxIter)
        kmeansMemo.put(key, (plan, df))
        df
    }
    ivfSearch(prepared(queries.select("vec_id", "embedding"), "sim.kmeans.qprep"),
      base, centroids, k, nProbes)
  }

  // Evicted via OpCache.clear(): entries hold localCheckpoint'd tables
  // keyed by (session, plan hash) — without eviction, scale-probe
  // loops and per-test sessions would retain one table per distinct
  // input plan for the JVM lifetime.
  private val kmeansMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, Int, Int, Int),
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]
  OpCache.registerClearHook(() => kmeansMemo.clear())

  /** Lloyd's k-means over a prepared (vec_id, vec, norm) corpus.
    * Output: (cell, cvec, cnorm) — the IVF centroid table shape.
    */
  private def kmeansCentroids(base: DataFrame, k: Int, maxIter: Int): DataFrame = {
    // Seed selection: deterministic hash-min k vectors. orderBy+limit
    // is TakeOrderedAndProject (per-partition top-k + merge), so the
    // full corpus is never globally sorted; the single-partition
    // row_number window then runs over only the k survivors.
    val seeds = base
      .select(col("vec_id"), col("vec"), xxhash64(col("vec_id")).as("__h"))
      .orderBy(col("__h"), col("vec_id"))
      .limit(k)
    val seedW = Window.orderBy(col("__h"), col("vec_id"))
    var cents = seeds
      .withColumn("__r", row_number().over(seedW))
      .select((col("__r") - 1).cast("int").as("cell"), col("vec").as("cvec"))
      .withColumn("cnorm", l2norm(col("cvec")))
      .localCheckpoint(true)
    var iter = 0
    while (iter < maxIter) {
      val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell").asc)
      val assigned = base.crossJoin(broadcast(cents))
        .select(
          base("vec_id"), base("vec"),
          col("cell"),
          cosineWithNorms(dot(col("vec"), col("cvec")), col("norm"), col("cnorm")).as("csim"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") === 1)
      cents = assigned
        .groupBy(col("cell"))
        .agg(graft.functions.VectorMean.vectorMean(col("vec")).as("cvec"))
        .withColumn("cnorm", l2norm(col("cvec")))
        .localCheckpoint(true) // truncate lineage each round
      iter += 1
    }
    cents
  }

  /** Shared IVF probe: assign corpus rows to their cell, queries to
    * their `nProbes` nearest cells, equi-join on cell, exact cosine +
    * top-k on the candidates. The pair dedup (a query probing two
    * cells can meet the same corpus row twice only if assignments
    * collide — kept for safety) runs on (ids, cosine scalar), never on
    * vector payloads.
    */
  private def ivfSearch(
      qprep: DataFrame,
      base: DataFrame,
      centroids: DataFrame,
      k: Int,
      nProbes: Int): DataFrame = {
    def assign(df: DataFrame, probes: Int): DataFrame = {
      val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell").asc)
      df.crossJoin(broadcast(centroids))
        .select(
          df("*"), col("cell"),
          cosineWithNorms(dot(col("vec"), col("cvec")), col("norm"), col("cnorm")).as("csim"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= probes)
        .drop("csim", "crank")
    }

    val corpus = assign(base, 1)
      .select(col("cell"), col("vec_id"), col("vec"), col("norm"))
    val queries = assign(qprep, nProbes)
      .select(col("cell"), col("vec_id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus
      .join(maybeBroadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        cosineWithNorms(dot(col("vec"), col("qvec")), col("norm"), col("qnorm")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** Embedding near-duplicate pairs: vectors whose cosine exceeds a
    * threshold, found via the same sign-LSH banding (no all-pairs).
    * The banded self-join and the pair dedup carry ids only — vectors
    * are re-attached per deduplicated pair, so shuffle volume is two
    * longs per candidate, not ~1 KB of array payload.
    * Output: (vec_a, vec_b, cosine) with vec_a < vec_b.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      minCosine: Double = 0.95,
      nPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = 64): DataFrame = {
    val base = OpCache.swap("sim.neardup.sig",
      prepared(embeddings, "sim.neardup.prep")
        .withColumn("sig", signLshSignature(col("vec"), nPlanes, dim)))
    val bandedIds = base.select(
      col("vec_id"),
      posexplode(array(signatureBands(col("sig"), nPlanes, bands): _*)).as(Seq("band_id", "band_key")))

    val a = bandedIds.select(col("band_id"), col("band_key"), col("vec_id").as("vec_a"))
    val b = bandedIds.select(col("band_id"), col("band_key"), col("vec_id").as("vec_b"))

    val pairs = a.join(b, Seq("band_id", "band_key"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")

    pairs
      .join(base.select(col("vec_id").as("vec_a"), col("vec").as("va"), col("norm").as("na")), Seq("vec_a"))
      .join(base.select(col("vec_id").as("vec_b"), col("vec").as("vb"), col("norm").as("nb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), round(cosineWithNorms(dot(col("va"), col("vb")), col("na"), col("nb")), 4).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
