package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessions

/** Direct lanes for the sessionizer (previously exercised only through
  * the oracled session queries): gap semantics, the null-position
  * exclusions, and the parameter guard.
  */
class SessionsSpec extends SparkSpec {

  private def ev(rows: Seq[(String, Long, Long)]) = {
    import sqlImplicits._
    rows.toDF("user_id", "event_id", "sec")
      .select(col("user_id"), col("event_id"), timestamp_seconds(col("sec")).as("ts"))
  }

  test("gap threshold splits sessions; ids are per-user and ordered") {
    val rows = Seq(
      ("u1", 1L, 0L), ("u1", 2L, 60L), ("u1", 3L, 4000L), // >30 min gap → new session
      ("u2", 4L, 0L))
    val out = Sessions.sessions(ev(rows), gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(("u1", 1, 2L), ("u1", 2, 1L), ("u2", 1, 1L)))
  }

  test("null ts and null user_id rows are excluded, not fabricated into sessions") {
    import sqlImplicits._
    // a null-ts event has no position in the ordered stream: it used
    // to sort FIRST, see a null lag, start its own degenerate session
    // and shift every real session_id by one; null user_id merged
    // unrelated users into one phantom window partition
    val rows = Seq(
      (Some("u1"), 1L, Some(0L)), (Some("u1"), 2L, Some(60L)),
      (Some("u1"), 3L, None), // null ts
      (None, 4L, Some(10L))) // null user
    val df = rows.toDF("user_id", "event_id", "sec")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("sec")).as("ts"))
    val out = Sessions.sessions(df, gapMinutes = 30).collect()
    assert(out.length == 1, s"one real session only: ${out.toSeq}")
    assert(out.head.getString(0) == "u1" && out.head.getInt(1) == 1)
    assert(out.head.getLong(2) == 2L, "only the two positioned events")
  }

  test("non-positive gapMinutes refuses loudly") {
    intercept[IllegalArgumentException] {
      Sessions.labeled(ev(Seq(("u", 1L, 0L))), gapMinutes = 0)
    }
    intercept[IllegalArgumentException] {
      Sessions.labeled(ev(Seq(("u", 1L, 0L))), gapMinutes = -5)
    }
  }
}
