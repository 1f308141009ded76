package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Heavy hitters: the Misra-Gries no-miss/underestimate guarantees
  * under adversarial partitioning, and the end-to-end two-pass result
  * being bit-equal to brute force regardless of stream order.
  */
class HeavyHittersSpec extends SparkSpec {
  import sqlImplicits._

  /** Zipf-ish random key stream: key i drawn with weight ~ 1/(i+1). */
  private def stream(rnd: scala.util.Random, n: Int, vocab: Int): Seq[String] =
    Seq.fill(n) {
      val u = rnd.nextDouble()
      // inverse-CDF of the harmonic weights, cheap approximation
      val i = math.min(vocab - 1, (math.pow(vocab + 1.0, u) - 1).toInt)
      s"k$i"
    }

  private def bruteHeavy(keys: Seq[String], k: Int): Seq[(String, Long)] = {
    val n = keys.size.toLong
    keys.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * (k + 1) > n }
      .sortBy { case (t, c) => (-c, t) }
  }

  test("frequentKeys equals brute force across partitionings and seeds (property, seeded)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val vocab = 5 + rnd.nextInt(200)
      val n = 500 + rnd.nextInt(4000)
      val k = 2 + rnd.nextInt(20)
      val keys = stream(rnd, n, vocab)
      val parts = 1 + rnd.nextInt(7)
      val df = keys.toDF("tok").repartition(parts)
      val got = HeavyHitters.frequentKeys(df, "tok", k)
        .as[(String, Long)].collect().toSeq
      assert(got == bruteHeavy(keys, k),
        s"trial $trial (vocab=$vocab n=$n k=$k parts=$parts)")
    }
  }

  test("misraGries sketch: underestimates, error <= N/(k+1), never misses a qualifier") {
    val rnd = new scala.util.Random(23)
    for (parts <- Seq(1, 3, 8)) {
      val n = 3000
      val k = 8
      val keys = stream(rnd, n, 400) // vocab 400 >> 2k — trims happen
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = keys.toDF("tok").repartition(parts)
        .agg(HeavyHitters.misraGries(col("tok"), k).as("m"))
        .select(explode(col("m"))).as[(String, Long)].collect().toMap
      assert(est.size <= k)
      est.foreach { case (t, e) =>
        assert(e <= truth(t), s"overestimate for $t at parts=$parts")
        assert(truth(t) - e <= n / (k + 1) + 1, s"error bound broken for $t at parts=$parts")
      }
      truth.foreach { case (t, c) =>
        if (c * (k + 1) > n)
          assert(est.contains(t), s"missed qualifier $t (cnt=$c) at parts=$parts")
      }
    }
  }

  test("folded sketch state over any batching yields the exact from-scratch heavy hitters") {
    import graft.streaming.EventStreams
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val keys = stream(rnd, 2000 + rnd.nextInt(2000), 300)
      val k = 4 + rnd.nextInt(12)
      val state = s"hh_fold_state_$trial"
      spark.sql(s"DROP TABLE IF EXISTS $state")
      // random contiguous batch split
      val cut1 = rnd.nextInt(keys.size)
      val cut2 = cut1 + rnd.nextInt(keys.size - cut1)
      val batches = Seq(keys.take(cut1), keys.slice(cut1, cut2), keys.drop(cut2))
      batches.zipWithIndex.foreach { case (b, i) =>
        EventStreams.foldSketchBatch(b.toDF("tok"), i.toLong, state, "tok", k)
      }
      // replayed id: must be a no-op
      EventStreams.foldSketchBatch(batches(1).toDF("tok"), 1L, state, "tok", k)
      val st = spark.table(state).drop("__last_batch")
      // exact total survived the folds
      assert(st.select("total").as[Long].head() == keys.size.toLong)
      val got = HeavyHitters.frequentFromSketch(st, keys.toDF("tok"), "tok", k)
        .as[(String, Long)].collect().toSeq
      assert(got == bruteHeavy(keys, k), s"trial $trial (k=$k cuts=$cut1/$cut2)")
      spark.sql(s"DROP TABLE IF EXISTS $state")
    }
  }

  test("edges: empty input, all-distinct keys, single dominant key") {
    assert(HeavyHitters.frequentKeys(Seq.empty[String].toDF("tok"), "tok", 5).count() == 0)
    // 100 distinct keys, each cnt=1: 1*(k+1) > 100 is false for k=5
    val distinct = (1 to 100).map(i => s"u$i").toDF("tok")
    assert(HeavyHitters.frequentKeys(distinct, "tok", 5).count() == 0)
    val dominated = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"cold$i")).toDF("tok")
    val r = HeavyHitters.frequentKeys(dominated, "tok", 3)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("hot", 90L)))
  }

  test("null keys are excluded, not a serialization crash or a threshold skew") {
    import sqlImplicits._
    // a null entering the Misra-Gries Map buffer killed the job at
    // buffer serialization; and counting null rows into N would raise
    // the frequency threshold against every real key
    val keys = ((1 to 90).map(_ => Some("hot")) ++ (1 to 20).map(_ => Option.empty[String]))
      .toDF("tok")
    val r = HeavyHitters.frequentKeys(keys, "tok", 3)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("hot", 90L)), s"got $r")
  }
}
