package graft

import graft.operators.Cdc

class CdcSpec extends SparkSpec {

  test("applyLog: latest wins, tombstones delete, untouched keys pass through") {
    import sqlImplicits._
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "v", "x")
    val log = Seq(
      // k1: U then D → deleted
      (1L, "a2", 11L, "U", 1L), (1L, "a2", 11L, "D", 2L),
      // k2: D then U → the update survives
      (2L, "b2", 21L, "D", 1L), (2L, "b2", 21L, "U", 2L),
      // k4: fresh insert
      (4L, "d", 40L, "I", 1L))
      .toDF("k", "v", "x", "op", "ord")
    val out = Cdc.applyLog(base, log, Seq("k"), "op", Seq("ord"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, "b2", 21L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("applyLog is idempotent when re-applied with an empty log") {
    import sqlImplicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val empty = Seq.empty[(Long, String, String, Long)].toDF("k", "v", "op", "ord")
    assert(Cdc.applyLog(base, empty, Seq("k"), "op", Seq("ord")).collect().toSeq ==
      base.collect().toSeq)
  }

  test("applyLog fails loudly on a null or unknown op instead of silently deleting") {
    import sqlImplicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // null op: under the old `=!= \"D\"` filter this row evaluated to
    // null and key 1 vanished from the snapshot — silent data loss
    val nullOp = Seq((1L, "a2", Option.empty[String], 1L)).toDF("k", "v", "op", "ord")
    val eNull = intercept[Exception] {
      Cdc.applyLog(base, nullOp, Seq("k"), "op", Seq("ord")).collect()
    }
    assert(eNull.getMessage != null)
    // unknown op value: same loud failure
    val badOp = Seq((2L, "b2", "X", 1L)).toDF("k", "v", "op", "ord")
    intercept[Exception] {
      Cdc.applyLog(base, badOp, Seq("k"), "op", Seq("ord")).collect()
    }
    // valid ops still flow
    val ok = Seq((2L, "b2", "U", 1L)).toDF("k", "v", "op", "ord")
    assert(Cdc.applyLog(base, ok, Seq("k"), "op", Seq("ord"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b2")))
  }
}
