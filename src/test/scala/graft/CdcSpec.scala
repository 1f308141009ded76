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
}
