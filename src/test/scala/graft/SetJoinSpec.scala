package graft

import org.apache.spark.sql.functions._

import graft.operators.SetJoin

class SetJoinSpec extends SparkSpec {

  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(23)
    val vocab = (1 to 40).map(i => s"w$i")
    val base = (1L to 60L).map { i =>
      i -> Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // planted near-dups: copies with small edits
    val dups = Seq(
      61L -> base(0)._2,
      62L -> (base(1)._2 + " extra"),
      63L -> base(2)._2.split(" ").drop(1).mkString(" "))
    base ++ dups ++ Seq(64L -> "") // empty doc must never pair
  }

  private def brute(t: Double): Set[(Long, Long)] = {
    val sets = corpus.map { case (id, s) =>
      id -> s.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter * 1000000L >= math.round(t * 1e6) * (sa.size + sb.size - inter)
    } yield (a, b)).toSet
  }

  test("prefix filtering is lossless: result equals brute force at every threshold") {
    import sqlImplicits._
    val df = corpus.toDF("doc_id", "text")
    // 0.55 and 1/3 exercise the thresholds where float ⌈t·sz⌉ rounds
    // one above the exact integer product; 1/3 is not 1e-6-representable
    // (brute quantizes identically, so both sides agree on tq/1e6).
    for (t <- Seq(0.3, 1.0 / 3, 0.5, 0.55, 0.8)) {
      val got = SetJoin.jaccardJoin(df, t)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(t), s"t=$t")
    }
    assert(brute(0.5).nonEmpty) // the planted dups actually bite
  }

  test("a pair at exactly the threshold survives the float-ceil rounding trap") {
    import sqlImplicits._
    // 0.55d * 20 = 11.000000000000001 → a float ceil yields 12 and
    // silently shortens the prefix; the integer bound keeps the pair.
    // Doc A: 20 distinct tokens; doc B: an 11-token subset → J = 0.55.
    val a = (1 to 20).map(i => s"t$i")
    val df = Seq(1L -> a.mkString(" "), 2L -> a.take(11).mkString(" "))
      .toDF("doc_id", "text")
    val got = SetJoin.jaccardJoin(df, 0.55)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, 2L, 11, 0.55)), s"got ${got.toSeq}")
  }

  test("reported intersection and jaccard are exact") {
    import sqlImplicits._
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "a b c d")).toDF("doc_id", "text")
    val rows = SetJoin.jaccardJoin(df, 0.5)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      (1L, 2L, 3, 0.6), (1L, 3L, 4, 1.0), (2L, 3L, 3, 0.6)))
  }

  test("result is independent of partitioning; plan has no cartesian") {
    import sqlImplicits._
    val df = corpus.toDF("doc_id", "text")
    val one = SetJoin.jaccardJoin(df.coalesce(1), 0.5)
      .select("doc_a", "doc_b").collect().map(_.toSeq).toSet
    val many = SetJoin.jaccardJoin(df.repartition(13), 0.5)
      .select("doc_a", "doc_b").collect().map(_.toSeq).toSet
    assert(one == many)
    val plan = SetJoin.jaccardJoin(df, 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }
}
