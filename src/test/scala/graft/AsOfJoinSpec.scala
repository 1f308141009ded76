package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right row at or before each left ts, per key") {
    import sqlImplicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")) // before any right row for key 2
      .toDF("k", "lts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0), // equal ts → inclusive match
      (1L, ts("2024-01-01 11:00:00"), 30.0),
      (2L, ts("2024-01-01 10:00:00"), 99.0))
      .toDF("k", "rts", "v")

    val out = AsOfJoin.joinAsOf(left, right, "k", "lts", "rts", Seq("v"))
      .orderBy("k", "lts")
      .collect()
      .map(r => (r.getAs[String]("tag"), Option(r.getAs[java.lang.Double]("v_asof")).map(_.toDouble)))

    assert(out(0) == (("p1", Some(20.0)))) // ties are inclusive: 10:00 right row wins
    assert(out(1) == (("p2", Some(30.0)))) // latest ≤ 12:00
    assert(out(2) == (("p3", None)))       // nothing at or before → null
  }

  test("as-of carries the matched right timestamp for gap computation") {
    import sqlImplicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "lts")
    val right = Seq((1L, ts("2024-01-01 11:15:00"), 5.0)).toDF("k", "rts", "v")
    val row = AsOfJoin.joinAsOf(left, right, "k", "lts", "rts", Seq("v")).head
    assert(row.getAs[Timestamp]("rts_asof") == ts("2024-01-01 11:15:00"))
  }

  test("matched right row with NULL payload yields NULL, not an older row's value") {
    import sqlImplicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "lts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(7.0)),
      (1L, ts("2024-01-01 11:00:00"), None)) // the match — its NULL must survive
      .toDF("k", "rts", "v")
    val row = AsOfJoin.joinAsOf(left, right, "k", "lts", "rts", Seq("v")).head
    assert(row.getAs[java.lang.Double]("v_asof") == null)
    assert(row.getAs[Timestamp]("rts_asof") == ts("2024-01-01 11:00:00"))
  }

  test("right rows with NULL timestamps never match (UNKNOWN predicate, not nulls-first)") {
    import sqlImplicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "lts")
    val right = Seq(
      (1L, None, Some(9.0)), // NULL ts: must not become anyone's match
      (1L, Some(ts("2024-01-01 11:00:00")), Some(5.0)))
      .toDF("k", "rts", "v")
    val row = AsOfJoin.joinAsOf(left, right, "k", "lts", "rts", Seq("v")).head
    assert(row.getAs[java.lang.Double]("v_asof") == 5.0)
    assert(row.getAs[Timestamp]("rts_asof") == ts("2024-01-01 11:00:00"))
  }

  test("right rows with NULL keys never match NULL-keyed left rows (ASOF equality is null-rejecting)") {
    import sqlImplicits._
    val left = Seq(
      (None, ts("2024-01-01 12:00:00"), "null-key"),
      (Some(1L), ts("2024-01-01 12:00:00"), "real-key"))
      .toDF("k", "lts", "tag")
    val right = Seq(
      (None, Some(ts("2024-01-01 11:00:00")), Some(9.0)), // NULL key: must match nothing
      (Some(1L), Some(ts("2024-01-01 11:00:00")), Some(5.0)))
      .toDF("k", "rts", "v")
    val out = AsOfJoin.joinAsOf(left, right, "k", "lts", "rts", Seq("v"))
      .collect()
      .map(r => r.getAs[String]("tag") -> Option(r.getAs[java.lang.Double]("v_asof")).map(_.toDouble))
      .toMap
    assert(out("null-key").isEmpty) // NULL = NULL never matches
    assert(out("real-key").contains(5.0))
  }

  test("left side already carrying a payload column name is rejected, not corrupted") {
    import sqlImplicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 123.0)).toDF("k", "lts", "v")
    val right = Seq((1L, ts("2024-01-01 11:00:00"), 5.0)).toDF("k", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOf(left, right, "k", "lts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("payload column"))
  }

  test("reserved internal column names on either side are rejected") {
    import sqlImplicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 1)).toDF("k", "lts", "__side")
    val right = Seq((1L, ts("2024-01-01 11:00:00"), 5.0)).toDF("k", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOf(left, right, "k", "lts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("__side"))
  }

  test("joinNearest picks the closer side, breaks ties backward, handles one-sided and no match") {
    import sqlImplicits._
    val left = Seq(
      (1L, 100L, ts("2024-01-01 12:00:00")), // bwd at 11:59 (60s), fwd at 12:10 (600s) → bwd
      (1L, 101L, ts("2024-01-01 12:08:00")), // bwd 11:59 (540s), fwd 12:10 (120s) → fwd
      (2L, 102L, ts("2024-01-01 12:00:00")), // only fwd exists (12:30)
      (3L, 103L, ts("2024-01-01 12:00:00")), // no right rows at all
      (4L, 104L, ts("2024-01-01 12:01:00"))) // equidistant (12:00 / 12:02) → bwd
      .toDF("k", "id", "lts")
    val right = Seq(
      (1L, ts("2024-01-01 11:59:00"), 1.0),
      (1L, ts("2024-01-01 12:10:00"), 2.0),
      (2L, ts("2024-01-01 12:30:00"), 3.0),
      (4L, ts("2024-01-01 12:00:00"), 4.0),
      (4L, ts("2024-01-01 12:02:00"), 5.0))
      .toDF("k", "rts", "v")
    val got = AsOfJoin.joinNearest(left, right, "k", "lts", "rts", Seq("v"))
      .orderBy("id")
      .collect()
      .map(r => (r.getAs[Long]("id"), Option(r.getAs[java.lang.Double]("v_near")),
        Option(r.getAs[String]("near_dir"))))
    assert(got.toSeq == Seq(
      (100L, Some(1.0: java.lang.Double), Some("bwd")),
      (101L, Some(2.0: java.lang.Double), Some("fwd")),
      (102L, Some(3.0: java.lang.Double), Some("fwd")),
      (103L, None, None),
      (104L, Some(4.0: java.lang.Double), Some("bwd"))))
  }

  test("joinNearest rejects output-name collisions instead of emitting duplicates") {
    import sqlImplicits._
    // a left column already named v_near would have silently
    // duplicated in the result and broken every downstream col()
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 9.9)).toDF("k", "lts", "v_near")
    val right = Seq((1L, ts("2024-01-01 11:00:00"), 5.0)).toDF("k", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.joinNearest(left, right, "k", "lts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("v_near"), e.getMessage)
  }
}
