package graft

import org.apache.spark.sql.SparkSession

/** Alternation audits for the r14 cache-key widening (the
  * ItemsetsSpec pattern): each family's single-slot caches must key
  * on every plan-shaping parameter, so two calls varying geometry or
  * column names on the SAME input never alternate one slot. Each test
  * runs on a fresh session — alternations are recorded per session,
  * and other suites legitimately re-run these operators on different
  * inputs under the same keys.
  */
class CacheKeyAuditSpec extends SparkSpec {

  private def docsOn(s: SparkSession) = {
    import s.implicits._
    Seq(
      (1L, "en", 20L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "en", 20L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "en", 18L, "pack my box with five dozen brown liquor jugs"))
      .toDF("doc_id", "lang", "n_chars", "text")
  }

  private def noAlts(s: SparkSession, prefix: String): Unit = {
    val alts = graft.operators.OpCache.alternations(s).keySet.filter(_.startsWith(prefix))
    assert(alts.isEmpty, s"$prefix cache keys alternated: $alts")
  }

  test("dedup minhash/ngram keys carry their geometry") {
    val s = spark.newSession()
    val d = docsOn(s)
    graft.operators.Dedup.minhashLshPairs(d, numHashes = 16).count()
    graft.operators.Dedup.minhashLshPairs(d, numHashes = 8, bands = 2).count()
    graft.operators.Dedup.ngramDupStats(d, shingleN = 5).count()
    graft.operators.Dedup.ngramDupStats(d, shingleN = 3).count()
    noAlts(s, "dedup.")
  }

  test("similarity LSH signature keys carry nPlanes/dim") {
    val s = spark.newSession()
    val emb = {
      import s.implicits._
      (1L to 12L).map(i =>
        (i, Array.tabulate(16)(j => ((i + j) % 5).toFloat - 2f)))
        .toDF("vec_id", "embedding")
    }
    graft.operators.Similarity.embeddingNearDupPairs(
      emb, minCosine = 0.9, nPlanes = 16, bands = 4, dim = 16).count()
    graft.operators.Similarity.embeddingNearDupPairs(
      emb, minCosine = 0.9, nPlanes = 8, bands = 4, dim = 16).count()
    noAlts(s, "sim.")
  }

  test("rake / setjoin / heavy-hitter keys carry their parameters") {
    val s = spark.newSession()
    val d = docsOn(s)
    graft.operators.TextAnalysis.rakeKeywords(d, maxPhraseLen = 4).count()
    graft.operators.TextAnalysis.rakeKeywords(d, maxPhraseLen = 2).count()
    noAlts(s, "text.rake.")
    graft.operators.SetJoin.jaccardJoin(d, 0.5).count()
    graft.operators.SetJoin.jaccardJoin(
      d.withColumnRenamed("doc_id", "id2"), 0.5, idCol = "id2").count()
    noAlts(s, "setjoin.")
    val keys = {
      import s.implicits._
      Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("k1", "k2")
    }
    graft.operators.HeavyHitters.frequentKeys(keys, "k1", 4).count()
    graft.operators.HeavyHitters.frequentKeys(keys, "k2", 4).count()
    noAlts(s, "hh.")
  }
}
