package graft

import java.sql.Timestamp

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("point-in-interval: inclusive bounds, chunk-spanning intervals, key isolation") {
    import sqlImplicits._
    val points = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // == interval start (inclusive)
      (1L, 101L, ts("2024-01-01 13:30:00")), // == interval end (inclusive)
      (1L, 102L, ts("2024-01-01 13:30:01")), // just outside
      (2L, 103L, ts("2024-01-01 11:00:00"))) // right key, wrong user
      .toDF("user_id", "event_id", "ts")
    // 3.5h interval spans 8 half-hour chunks
    val intervals = Seq((1L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:30:00")))
      .toDF("user_id", "iv_id", "start_ts", "end_ts")

    val hits = RangeJoin
      .pointInInterval(points, intervals, "user_id", "ts", "start_ts", "end_ts")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(100L, 101L))
  }

  test("a point inside two overlapping intervals matches each exactly once") {
    import sqlImplicits._
    val points = Seq((1L, 1L, ts("2024-01-01 10:15:00"))).toDF("user_id", "event_id", "ts")
    val intervals = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (1L, 11L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("user_id", "iv_id", "start_ts", "end_ts")
    val out = RangeJoin
      .pointInInterval(points, intervals, "user_id", "ts", "start_ts", "end_ts")
      .select("iv_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(out == Seq(10L, 11L)) // both, no duplicates
  }

  test("inverted/null intervals are dropped before exploding; bad params refuse") {
    import sqlImplicits._
    val points = Seq((1L, 1L, ts("2024-01-01 10:15:00"))).toDF("user_id", "event_id", "ts")
    // an inverted interval (end before start) can never match — but
    // sequence(a, b) steps −1 when a > b, so one corrupt epoch-0
    // sentinel end would have exploded into ~10⁶ descending chunks
    val bad = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (1L, 11L, ts("2024-01-01 12:00:00"), new java.sql.Timestamp(0L)),
      (1L, 12L, null.asInstanceOf[java.sql.Timestamp], ts("2024-01-01 11:00:00")))
      .toDF("user_id", "iv_id", "start_ts", "end_ts")
    val out = RangeJoin
      .pointInInterval(points, bad, "user_id", "ts", "start_ts", "end_ts")
      .select("iv_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(10L), s"got $out")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, bad, "user_id", "ts", "start_ts", "end_ts",
        chunkSeconds = 0L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        points.withColumn("__chunk", org.apache.spark.sql.functions.lit(1)),
        bad, "user_id", "ts", "start_ts", "end_ts")
    }
  }
}
