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

  test("applyLog handles NULL keys: tombstones delete them, upserts replace not duplicate") {
    import sqlImplicits._
    // the latest-wins window groups NULL keys (GROUP BY semantics),
    // but a using-column anti join never matches NULL = NULL: a
    // NULL-key tombstone was silently ignored and a NULL-key upsert
    // silently kept BOTH the old and the new row
    val base = Seq((Some(1L), "a"), (Option.empty[Long], "n")).toDF("k", "v")
    val upsert = Seq((Option.empty[Long], "n2", "U", 1L)).toDF("k", "v", "op", "ord")
    val afterU = Cdc.applyLog(base, upsert, Seq("k"), "op", Seq("ord"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1)).toSeq
    assert(afterU.sortBy(_._2) == Seq(Some(1L) -> "a", None -> "n2"),
      s"NULL-key upsert must REPLACE, got $afterU")
    val tomb = Seq((Option.empty[Long], "n", "D", 1L)).toDF("k", "v", "op", "ord")
    val afterD = Cdc.applyLog(base, tomb, Seq("k"), "op", Seq("ord"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1)).toSeq
    assert(afterD == Seq(Some(1L) -> "a"), s"NULL-key tombstone must delete, got $afterD")
  }

  test("applyLog: a version column shared with the base snapshot is payload and survives") {
    import sqlImplicits._
    // ordering by a column that IS part of the snapshot (updated_at —
    // the most common CDC shape) previously crashed deep inside
    // unionByName after the upsert branch dropped it
    val base = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "updated_at")
    val log = Seq((1L, "a2", 11L, "U")).toDF("k", "v", "updated_at", "op")
    val out = Cdc.applyLog(base, log, Seq("k"), "op", Seq("updated_at"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "a2", 11L), (2L, "b", 20L)))
    // the op column can never be base payload — log metadata only
    val opInBase = Seq((1L, "a", "I")).toDF("k", "v", "op")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyLog(opInBase, log.withColumnRenamed("updated_at", "ts"), Seq("k"), "op", Seq("ts"))
    }
    assert(e.getMessage.contains("op column"))
  }
}
