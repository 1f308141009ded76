package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** Incremental rollup maintenance: merge-of-states equals
  * from-scratch, independent of batch boundaries and merge order;
  * retraction via negated states.
  */
class IncrementalAggSpec extends SparkSpec {

  private lazy val rows = {
    import sqlImplicits._
    Seq(
      ("a", 10.25), ("a", 0.50), ("a", 3.125), ("b", 100.0),
      ("b", 0.0625), ("c", 7.75), ("c", 2.25), ("c", 0.125), ("c", 9.0))
      .toDF("k", "v")
  }

  private def finalized(state: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.finalizeState(state, Seq("k"), Seq("v"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

  test("merge of arbitrary batch splits equals the from-scratch rollup") {
    val full = finalized(IncrementalAgg.rollup(rows, Seq("k"), Seq("v")))
    // three different splits, one of them three-way, one merged in reverse
    val s1 = Seq(rows.limit(4), rows.exceptAll(rows.limit(4)))
    val s2 = Seq(rows.limit(2), rows.exceptAll(rows.limit(7)), rows.limit(7).exceptAll(rows.limit(2)))
    for (split <- Seq(s1, s1.reverse, s2, s2.reverse)) {
      val states = split.map(b => IncrementalAgg.rollup(b, Seq("k"), Seq("v")))
      assert(finalized(IncrementalAgg.merge(states, Seq("k"))) === full)
    }
  }

  test("out-of-domain measures raise instead of vanishing from the state") {
    import sqlImplicits._
    // 1e15 exceeds DECIMAL(18,4)'s 14 integral digits: the non-ANSI
    // cast would null it silently — still counted in n, absent from
    // sum_v, every derived average skewed. The guard must raise.
    val bad = Seq(("a", 1.0), ("a", 1e15)).toDF("k", "v")
    val e = intercept[Exception] {
      IncrementalAgg.rollup(bad, Seq("k"), Seq("v")).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(messages.contains("DECIMAL(18,4)"), messages.take(300))
    // Near the domain boundary (exactly representable as a double) is fine.
    val edge = Seq(("a", 99999999999999.0)).toDF("k", "v")
    assert(IncrementalAgg.rollup(edge, Seq("k"), Seq("v")).collect().length == 1)
  }

  test("a negated state retracts a batch exactly") {
    val batch = rows.limit(3)
    val withBatch = IncrementalAgg.rollup(rows, Seq("k"), Seq("v"))
    val negated = IncrementalAgg.rollup(batch, Seq("k"), Seq("v"))
      .select(col("k"), (-col("n")).as("n"), (-col("sum_v")).as("sum_v"),
        (-col("n_v")).as("n_v"))
    val retracted = IncrementalAgg.merge(Seq(withBatch, negated), Seq("k"))
      // retraction can leave n = 0 keys; a reader drops them
      .filter(col("n") > 0)
    val direct = IncrementalAgg.rollup(rows.exceptAll(batch), Seq("k"), Seq("v"))
    assert(finalized(retracted) === finalized(direct))
  }

  test("random splits, merge orders, and nested merges all equal from-scratch (property, seeded)") {
    import sqlImplicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(200)((
      s"k${rnd.nextInt(6)}",
      // dyadic fractions: exact in decimal(18,4) AND in double
      (rnd.nextInt(1 << 14).toDouble / 16.0)))
    val full = finalized(IncrementalAgg.rollup(data.toDF("k", "v"), Seq("k"), Seq("v")))
    for (trial <- 1 to 5) {
      // random 2-5-way split with shuffled batch order
      val n = 2 + rnd.nextInt(4)
      val shuffled = rnd.shuffle(data)
      val bounds = (Seq(0, shuffled.size) ++ Seq.fill(n - 1)(rnd.nextInt(shuffled.size + 1))).sorted
      val batches = bounds.zip(bounds.tail).map { case (a, b) => shuffled.slice(a, b) }
      val states = rnd.shuffle(batches).map(b => IncrementalAgg.rollup(b.toDF("k", "v"), Seq("k"), Seq("v")))
      // fold pairwise (nested merges of merges), not just one flat merge
      val folded = states.reduce((a, b) => IncrementalAgg.merge(Seq(a, b), Seq("k")))
      assert(finalized(folded) === full, s"trial $trial diverged")
    }
  }

  test("finalize derives totals and 4-dp averages") {
    val out = finalized(IncrementalAgg.rollup(rows, Seq("k"), Seq("v")))
    val a = out.find(_._1 == "a").get
    assert(a._2 == 3L && a._3 == 13.875 && a._4 == 4.625)
  }

  test("null measures stay out of the average's denominator (the davg contract)") {
    import sqlImplicits._
    // the old finalize divided by the all-rows n: a 50 %-null measure
    // read at half its true mean with no signal
    val half = Seq(("a", Some(10.0)), ("a", None), ("a", Some(20.0)), ("a", None))
      .toDF("k", "v")
    val out = finalized(IncrementalAgg.rollup(half, Seq("k"), Seq("v")))
    assert(out.head._2 == 4L, "n still counts every row")
    assert(out.head._3 == 30.0)
    assert(out.head._4 == 15.0, s"avg over the 2 real values, not /4: ${out.head}")
    // and the n_v column merges additively like the sum
    val s1 = IncrementalAgg.rollup(half.limit(2), Seq("k"), Seq("v"))
    val s2 = IncrementalAgg.rollup(half.exceptAll(half.limit(2)), Seq("k"), Seq("v"))
    val merged = finalized(IncrementalAgg.merge(Seq(s1, s2), Seq("k")))
    assert(merged.head._4 == 15.0, merged.head.toString)
  }
}
