package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalJoin

class IncrementalJoinSpec extends SparkSpec {

  test("maintained view equals the full re-join on random append splits") {
    import sqlImplicits._
    val rnd = new scala.util.Random(41)
    val allA = (1 to 120).map(i => (rnd.nextInt(40).toLong, s"a$i"))
    val allB = (1 to 150).map(i => (rnd.nextInt(40).toLong, i * 1.5))
    val (aOld, aNew) = allA.partition(_ => rnd.nextBoolean())
    val (bOld, bNew) = allB.partition(_ => rnd.nextBoolean())
    val (a, da) = (aOld.toDF("k", "av"), aNew.toDF("k", "av"))
    val (b, db) = (bOld.toDF("k", "bv"), bNew.toDF("k", "bv"))
    val view = a.join(b, Seq("k"))
    val maintained = IncrementalJoin.maintain(view, a, da, b, db, Seq("k"))
      .orderBy("k", "av", "bv").collect().map(_.toSeq).toSeq
    val full = allA.toDF("k", "av").join(allB.toDF("k", "bv"), Seq("k"))
      .orderBy("k", "av", "bv").collect().map(_.toSeq).toSeq
    assert(maintained.sorted(math.Ordering.by((s: Seq[Any]) => s.toString)) ==
      full.sorted(math.Ordering.by((s: Seq[Any]) => s.toString)))
  }

  test("delta terms carry disjoint provenance and only delta-touching rows") {
    import sqlImplicits._
    val a = Seq((1L, "a1")).toDF("k", "av")
    val da = Seq((1L, "a2"), (2L, "a3")).toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    val db = Seq((1L, "b3")).toDF("k", "bv")
    val delta = IncrementalJoin.joinDelta(a, da, b, db, Seq("k"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    val exp = Set(
      ("a2", "b1", "left"), ("a3", "b2", "left"), // ΔA ⋈ B
      ("a1", "b3", "right"),                      // A ⋈ ΔB
      ("a2", "b3", "both"))                       // ΔA ⋈ ΔB
    assert(delta == exp, delta.toString)
  }
}
