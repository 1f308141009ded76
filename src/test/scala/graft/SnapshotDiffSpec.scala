package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

/** Snapshot diff on planted data: add / remove / change / unchanged,
  * null-vs-empty discrimination, and the digest-only shuffle shape.
  */
class SnapshotDiffSpec extends SparkSpec {

  test("classifies added, removed, changed; drops unchanged") {
    import sqlImplicits._
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "s", "v")
    val nw = Seq((2L, "b", 20), (3L, "c", 31), (4L, "d", 40)).toDF("id", "s", "v")
    val res = SnapshotDiff.diff(old, nw, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("null and empty string are different values") {
    import sqlImplicits._
    val old = Seq((1L, Option.empty[String]), (2L, Option(""))).toDF("id", "s")
    val nw = Seq((1L, Option("")), (2L, Option.empty[String])).toDF("id", "s")
    val res = SnapshotDiff.diff(old, nw, Seq("id")).collect()
    assert(res.length == 2 && res.forall(_.getString(1) == "changed"))
  }

  test("column order does not affect the digest") {
    import sqlImplicits._
    val old = Seq((1L, "x", 1.5)).toDF("id", "s", "v")
    val nw = Seq((1L, 1.5, "x")).toDF("id", "v", "s") // same values, reordered schema
    assert(SnapshotDiff.diff(old, nw, Seq("id")).count() == 0)
  }

  test("mismatched value columns are rejected") {
    import sqlImplicits._
    val old = Seq((1L, "x")).toDF("id", "s")
    val nw = Seq((1L, "x", 2)).toDF("id", "s", "extra")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, nw, Seq("id"))
    }
  }

  test("the join sides carry only key and digest, not value columns") {
    import sqlImplicits._
    val old = Seq((1L, "payload-a", 10)).toDF("id", "s", "v")
    val nw = Seq((1L, "payload-b", 10)).toDF("id", "s", "v")
    val plan = SnapshotDiff.diff(old, nw, Seq("id"))
      .queryExecution.optimizedPlan
    // Value columns must be digested away below the join: no join
    // attribute may be a raw value column.
    val join = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.head
    val joinAttrs = (join.left.output ++ join.right.output).map(_.name).toSet
    assert(joinAttrs == Set("__ka_id", "__kb_id", "__ha", "__hb"), s"join carries $joinAttrs")
  }

  test("an unchanged null-keyed row is not double-reported") {
    import sqlImplicits._
    // the plain USING full-outer treated NULL ≠ NULL: an identical
    // null-keyed row on both sides came back as BOTH 'added' and
    // 'removed', so a CDC apply would delete + re-insert an untouched
    // row — the join is null-safe (<=>) now
    val old = Seq((Option(1L), "a"), (Option.empty[Long], "n")).toDF("id", "s")
    val nw = Seq((Option(1L), "a"), (Option.empty[Long], "n")).toDF("id", "s")
    assert(SnapshotDiff.diff(old, nw, Seq("id")).count() == 0)
    // and a CHANGED null-keyed row reports exactly once
    val nw2 = Seq((Option(1L), "a"), (Option.empty[Long], "m")).toDF("id", "s")
    val res = SnapshotDiff.diff(old, nw2, Seq("id")).collect()
    assert(res.length == 1 && res.head.getString(1) == "changed", res.toSeq.toString)
  }
}
