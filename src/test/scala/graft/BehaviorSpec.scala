package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 UTC

  private def events = {
    import sqlImplicits._
    Seq(
      // u1 completes view→click→buy in order
      (1L, "view", ts(0), 1L), (1L, "click", ts(10), 2L), (1L, "buy", ts(20), 3L),
      // u2 clicks BEFORE viewing: stage 2 must not count the early click
      (2L, "click", ts(0), 4L), (2L, "view", ts(5), 5L), (2L, "buy", ts(9), 6L),
      // u3 views only
      (3L, "view", ts(1), 7L),
      // u4 never views
      (4L, "click", ts(1), 8L), (4L, "buy", ts(2), 9L))
      .toDF("user_id", "event_type", "ts", "event_id")
  }

  test("funnel enforces strict event ordering per user") {
    val got = Behavior.funnel(events, Seq("view", "click", "buy"))
      .orderBy("stage")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // stage1: u1,u2,u3 viewed → 3; stage2: only u1 clicked after
    // viewing → 1 (u2's click precedes the view); stage3: u1 → 1
    assert(got.toSeq == Seq((1, "view", 3L), (2, "click", 1L), (3, "buy", 1L)))
  }

  test("conversion window drops slow completions") {
    // u1 clicks 10 min after viewing: a 5-minute window loses stage 2
    val tight = Behavior.funnel(
      events, Seq("view", "click", "buy"), withinSeconds = Some(300L))
      .orderBy("stage").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(tight.toSeq == Seq((1, 3L), (2, 0L), (3, 0L)))
    // u2's 4-minute view→buy also fits a 5-minute DIRECT funnel
    val direct = Behavior.funnel(
      events, Seq("view", "buy"), withinSeconds = Some(300L))
      .orderBy("stage").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(direct.toSeq == Seq((1, 3L), (2, 1L)))
  }

  test("transitions count consecutive pairs in (ts, id) order") {
    val got = Behavior.transitions(events)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("view", "click") -> 1L, ("click", "buy") -> 2L,
      ("click", "view") -> 1L, ("view", "buy") -> 1L))
  }

  test("cohort retention: first-week cohorts with exact week offsets") {
    import sqlImplicits._
    val wk = 7 * 24 * 60
    val log = Seq(
      (1L, ts(0), 1L), (1L, ts(wk + 5), 2L), (1L, ts(3 * wk), 3L),
      (2L, ts(wk), 4L), (2L, ts(wk + 10), 5L),
      (3L, ts(2), 6L))
      .toDF("user_id", "ts", "event_id")
    val got = Behavior.cohortRetention(log)
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap
    // 2024-01-01 is a Monday: cohort week = that Monday for u1/u3,
    // the next Monday for u2
    val w0 = ts(0); val w1 = ts(wk)
    assert(got == Map(
      (w0, 0) -> 2L, (w0, 1) -> 1L, (w0, 3) -> 1L,
      (w1, 0) -> 1L))
  }

  test("conversionLags: exact median/p90 of stage gaps over completing users") {
    import sqlImplicits._
    // gaps view→click: u1 600s, u2 240s, u3 never clicks → median of
    // {240, 600} = 420 (half-exact); click→buy: only u1, 600s
    val ev = Seq(
      (1L, "view", ts(0), 1L), (1L, "click", ts(10), 2L), (1L, "buy", ts(20), 3L),
      (2L, "view", ts(0), 4L), (2L, "click", ts(4), 5L),
      (3L, "view", ts(1), 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.conversionLags(ev, Seq("view", "click", "buy"))
      .orderBy("stage")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length == 2)
    assert(got(0) == ((1, "view", "click", 2L, 420.0, 564.0)))
    assert(got(1) == ((2, "click", "buy", 1L, 600.0, 600.0)))
  }

  test("attribution: last-touch goes to the latest touch, linear splits 1/n") {
    import sqlImplicits._
    val ev = Seq(
      // u1: view @0, click @10, buy @20 → last = click, linear ½ each
      (1L, "view", ts(0), 1L), (1L, "click", ts(10), 2L), (1L, "buy", ts(20), 3L),
      // u2: click @0, buy @5 → last = click, linear 1.0
      (2L, "click", ts(0), 4L), (2L, "buy", ts(5), 5L),
      // u3: touch AFTER the conversion → no credit anywhere
      (3L, "buy", ts(0), 6L), (3L, "view", ts(1), 7L),
      // u4: touch outside the lookback (2h earlier, lookback 1h)
      (4L, "view", ts(0), 8L), (4L, "buy", ts(120), 9L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.attribution(ev, "buy", lookbackSeconds = 3600L)
      .orderBy("channel")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("click", 2L, 2L, 1.5),
      ("view", 0L, 1L, 0.5)))
  }

  test("attribution tie on touch_ts breaks by highest event_id") {
    import sqlImplicits._
    val ev = Seq(
      (1L, "view", ts(0), 10L), (1L, "click", ts(0), 11L), (1L, "buy", ts(1), 12L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.attribution(ev, "buy", 3600L)
      .filter(col("n_last_touch") === 1).select("channel")
      .head().getString(0)
    assert(got == "click") // event_id 11 > 10 at the same ts
  }

  test("null user keys are unattributable: excluded from funnel and transitions") {
    import sqlImplicits._
    val e = Seq(
      (Some(1L), "view", ts(0), 1L), (Some(1L), "click", ts(1), 2L),
      // two UNRELATED unkeyed events: previously one phantom "user"
      // (funnel n1 + a fabricated view→click completion; a fabricated
      // transition chaining different visitors)
      (None, "view", ts(2), 3L), (None, "click", ts(3), 4L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val f = Behavior.funnel(e, Seq("view", "click")).orderBy("stage")
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(f.toSeq == Seq((1, 1L), (2, 1L)), f.toSeq.toString)
    val t = Behavior.transitions(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(t.toSeq == Seq(("view", "click", 1L)),
      s"unkeyed events must not chain into transitions: ${t.toSeq}")
  }

  test("attribution is correct with per-user-unique (not globally unique) event ids") {
    import sqlImplicits._
    // both users' conversions share event_id 42 — the common sharded
    // id scheme; a conv_id-only window merged their touch sets
    // (linear credit split across both users, one last-touch lost)
    val e = Seq(
      (1L, "ad", ts(0), 1L), (1L, "buy", ts(1), 42L),
      (2L, "email", ts(0), 2L), (2L, "buy", ts(1), 42L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.attribution(e, "buy", lookbackSeconds = 3600L)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("ad", 1L, 1L, 1.0), ("email", 1L, 1L, 1.0)),
      got.toSeq.toString)
  }

  test("results are independent of partitioning") {
    val a = Behavior.transitions(events.coalesce(1)).collect().map(_.toSeq).toSet
    val b = Behavior.transitions(events.repartition(7)).collect().map(_.toSeq).toSet
    assert(a == b)
    val fa = Behavior.funnel(events.repartition(5), Seq("view", "click", "buy"))
      .collect().map(_.toSeq).toSet
    val fb = Behavior.funnel(events.coalesce(1), Seq("view", "click", "buy"))
      .collect().map(_.toSeq).toSet
    assert(fa == fb)
  }

  test("cohort week offsets are calendar weeks, exact across a DST spring-forward") {
    // a fixed-604800-second division read the 603600-second DST week
    // as offset 0, merging week-1 retention into week 0 for any
    // non-UTC session timezone
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    import s2.implicits._
    val ev = Seq(
      (1L, new java.sql.Timestamp(1709528400000L)), // Mon 2024-03-04 00:00 EST (cohort week)
      (1L, new java.sql.Timestamp(1710259200000L))) // Tue 2024-03-12 12:00 EDT (next week, across DST)
      .toDF("user_id", "ts")
    val offs = graft.operators.Behavior.cohortRetention(ev)
      .collect().map(_.getAs[Int]("week_offset")).sorted
    assert(offs.toSeq == Seq(0, 1),
      s"the post-DST week must be offset 1, got ${offs.toSeq}")
  }
}
