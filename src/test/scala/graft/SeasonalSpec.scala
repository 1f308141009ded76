package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Seasonal

class SeasonalSpec extends SparkSpec {

  // 2024-01-01 00:00 UTC is a Monday → isodow 1
  private def ts(dayOffset: Int, hour: Int, min: Int = 0) =
    new Timestamp(1704067200000L + ((dayOffset * 24L + hour) * 60L + min) * 60000L)

  test("flags only points beyond k·MAD of their hour-of-week slot") {
    import sqlImplicits._
    // slot (m, Monday, 9h): tight cluster around 10 plus one wild point
    val slot = Seq(9.8, 10.0, 10.0, 10.2, 10.1, 9.9, 500.0)
      .zipWithIndex.map { case (v, i) => ("m", ts(0, 9, i), v) }
    // slot (m, Tuesday, 9h): all identical → MAD 0, nothing flagged
    val flat = (0 to 4).map(i => ("m", ts(1, 9, i), 7.0))
    val df = (slot ++ flat).toDF("event_type", "ts", "value")
    val got = Seasonal.hourOfWeekAnomalies(df, k = 4.0)
      .orderBy("isodow")
      .collect()
    assert(got.length == 2)
    val mon = got(0)
    assert(mon.getAs[Int]("isodow") == 1 && mon.getAs[Int]("hour") == 9)
    assert(mon.getAs[Long]("n") == 7L)
    assert(mon.getAs[Double]("med") == 10.0)
    assert(mon.getAs[Long]("n_anomalies") == 1L)
    val tue = got(1)
    assert(tue.getAs[Int]("isodow") == 2)
    assert(tue.getAs[Double]("mad") == 0.0)
    assert(tue.getAs[Long]("n_anomalies") == 0L) // MAD 0 guard: no flags
    assert(tue.getAs[Long]("n_exceed_exact") == 0L) // truly constant slot
    // the non-degenerate slot keeps the secondary screen quiet
    assert(mon.getAs[Long]("n_exceed_exact") == 0L)
  }

  test("degenerate-MAD slots surface exact exceedances (secondary screen)") {
    import sqlImplicits._
    // flat-lined heartbeat (≥50 % of values identical → MAD 0) with
    // one wild point: the k·MAD screen is structurally blind here
    // (cutoff 0·k with a mad_u>0 guard), so n_anomalies stays 0 — the
    // r13 contract documented the blind spot; n_exceed_exact closes it
    val flatWithSpike = Seq(7.0, 7.0, 7.0, 7.0, 500.0)
      .zipWithIndex.map { case (v, i) => ("hb", ts(0, 3, i), v) }
      .toDF("event_type", "ts", "value")
    val r = Seasonal.hourOfWeekAnomalies(flatWithSpike, k = 4.0).head()
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_anomalies") == 0L)
    assert(r.getAs[Long]("n_exceed_exact") == 1L, s"the 500.0 point must surface: $r")
    // two-sided: below-median exceedances count too
    val dip = Seq(7.0, 7.0, 7.0, 0.5, 7.0, 6.9)
      .zipWithIndex.map { case (v, i) => ("hb", ts(0, 4, i), v) }
      .toDF("event_type", "ts", "value")
    val r2 = Seasonal.hourOfWeekAnomalies(dip, k = 4.0).head()
    assert(r2.getAs[Double]("mad") == 0.0)
    assert(r2.getAs[Long]("n_exceed_exact") == 2L, s"0.5 and 6.9 differ from med 7: $r2")
  }

  test("median and MAD are exact on even counts (half-integer interpolation)") {
    import sqlImplicits._
    val df = Seq(1.0, 2.0, 4.0, 8.0).zipWithIndex
      .map { case (v, i) => ("m", ts(0, 12, i), v) }
      .toDF("event_type", "ts", "value")
    val r = Seasonal.hourOfWeekAnomalies(df).head()
    assert(r.getAs[Double]("med") == 3.0) // (2+4)/2
    // abs devs in units: 2, 1, 1, 5 → sorted 1,1,2,5 → median 1.5
    assert(r.getAs[Double]("mad") == 1.5)
  }

  test("NaN values are excluded; out-of-domain values raise instead of vanishing") {
    import sqlImplicits._
    // NaN quantized to a NULL vu silently: the row stayed in n while
    // dropping out of the median AND the anomaly count
    val df = (Seq(0.9, 1.0, 1.05, 1.1, 50.0, Double.NaN))
      .zipWithIndex.map { case (v, i) => ("m", ts(0, 9, i), v) }
      .toDF("event_type", "ts", "value")
    val row = Seasonal.hourOfWeekAnomalies(df, k = 4.0).head()
    assert(row.getAs[Long]("n") == 5L, s"NaN must not count as an observation: $row")
    assert(row.getAs[Long]("n_anomalies") == 1L, s"the 50.0 spike must flag: $row")
    // a value outside DECIMAL(18,4) previously became an INVISIBLE
    // anomaly — the extreme point this screen exists to catch
    val big = (Seq(1.0, 1.0, 1.0, 2e14))
      .zipWithIndex.map { case (v, i) => ("m", ts(0, 9, i), v) }
      .toDF("event_type", "ts", "value")
    intercept[Exception] {
      Seasonal.hourOfWeekAnomalies(big, k = 4.0).collect()
    }
  }

  test("results are independent of partitioning") {
    import sqlImplicits._
    val df = (0 until 500).map(i =>
      (s"t${i % 2}", ts(i % 7, i % 24, i % 60), (i % 13).toDouble))
      .toDF("event_type", "ts", "value")
    val a = Seasonal.hourOfWeekAnomalies(df.coalesce(1)).collect().map(_.toSeq).toSet
    val b = Seasonal.hourOfWeekAnomalies(df.repartition(11)).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
