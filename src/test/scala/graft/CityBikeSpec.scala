package graft

import org.apache.spark.sql.functions._

import graft.etl.CityBike

/** Pipeline-fidelity goldens + referential integrity for the star
  * schema (SURVEY §5.2 items 4-5) on the 50,611-row dump fixture.
  */
class CityBikeSpec extends SparkSpec {

  private lazy val wh = CityBike.build(spark)

  test("dimension and fact cardinalities match the dump profile") {
    assert(wh.memberDim.count() == 2)
    assert(wh.rideableDim.count() == 2)
    assert(wh.stationDim.count() == 172)
    assert(wh.dateDim.count() == 101201)
    assert(wh.fact.count() == 50611)
  }

  test("referential integrity: every non-null fact FK resolves to its dimension") {
    def dangling(fk: String, dim: org.apache.spark.sql.DataFrame): Long =
      wh.fact.filter(col(fk).isNotNull)
        .join(dim.select(col("id").as(fk)), Seq(fk), "left_anti").count()
    assert(dangling("member_type_id", wh.memberDim) == 0)
    assert(dangling("rideable_type_id", wh.rideableDim) == 0)
    assert(dangling("start_station_id", wh.stationDim) == 0)
    assert(dangling("end_station_id", wh.stationDim) == 0)
    assert(dangling("start_date_id", wh.dateDim) == 0)
    assert(dangling("end_date_id", wh.dateDim) == 0)
  }

  test("null station keys only where the raw row had null station fields (132 rows)") {
    val nullFk = wh.fact.filter(col("start_station_id").isNull || col("end_station_id").isNull).count()
    val nullRaw = wh.rides.filter(
      col("start_station_name").isNull || col("start_lat").isNull || col("start_lng").isNull ||
        col("end_station_name").isNull || col("end_lat").isNull || col("end_lng").isNull).count()
    assert(nullFk == nullRaw)
    assert(nullRaw == 107) // 132 rows have *some* null; 107 have a null station join key
  }

  test("member/date FKs are never null; measures behave") {
    assert(wh.fact.filter(col("member_type_id").isNull || col("rideable_type_id").isNull ||
      col("start_date_id").isNull || col("end_date_id").isNull).count() == 0)
    assert(wh.fact.filter(col("speed").isNull || isnan(col("speed")) ||
      col("speed") === Double.PositiveInfinity).count() == 0)
    assert(wh.fact.filter(col("trip_duration") < 0).count() == 0)
  }

  test("warehouse tables conform to the typed schemas (Dataset[T] edges)") {
    import sqlImplicits._
    import graft.schema.Schemas._
    // .as[T] throws on any missing/incompatible column; counts force evaluation.
    assert(wh.memberDim.as[TypeDimension].count() == 2)
    assert(wh.stationDim.as[StationDimension].count() == 172)
    assert(wh.dateDim.as[DateDimension].filter(_.year.contains(2025)).count() > 0)
    val fast = wh.fact.as[RideFact].filter(f => f.speed > 15.0 && f.distance.exists(_ > 1.0))
    assert(fast.count() > 0)
    assert(wh.rides.as[Ride].head.ride_id.nonEmpty)
    assert(graft.schema.Schemas.rideFact.fieldNames.toSeq == wh.fact.schema.fieldNames.toSeq)
  }

  test("v2 day-grain date dimension and v3 time dimension build correctly") {
    val dayDim = graft.etl.CityBike.dateDimensionDayGrain(wh.rides)
    // span 2024-12-31 → 2025-01-31 = 32 calendar days
    assert(dayDim.count() == 32)
    assert(dayDim.filter(org.apache.spark.sql.functions.col("id") === "20250116").count() == 1)
    val timeDim = graft.etl.CityBike.timeDimension(wh.rides)
    val n = timeDim.count()
    // 101k timestamps land on ~50k of the 86,400 second-of-day slots
    assert(n > 40000 && n <= 86400, s"time dim rows $n")
  }

  test("uuid key mode produces valid distinct keys (fidelity flag)") {
    import org.apache.spark.sql.functions._
    val dim = wh.rides.select(col("member_casual").as("type")).distinct()
      .select(graft.functions.CoreFunctions.surrogateKeyUuid().as("id"), col("type"))
    val rows = dim.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).distinct.length == 2)
    assert(rows.forall(_.getString(0).matches("[0-9a-f-]{36}")))
  }

  test("a known ride carries hand-checked measures through the pipeline") {
    // FIXTURES.md sample row: 880A0159BA5275FB, 2025-01-16 17:50:49.136 →
    // 17:57:00.71, Hilltop (40.7311689,-74.0575736) → Pershing Field
    // (40.742677141,-74.051788633), member, electric_bike.
    val ride = wh.rides.filter(col("ride_id") === "880A0159BA5275FB").head
    val joined = wh.fact
      .join(wh.dateDim.select(col("id").as("start_date_id"), col("date")), "start_date_id")
      .filter(col("date") === ride.getAs[java.sql.Timestamp]("started_at"))
      .filter(col("trip_duration") === 371)
      .head
    val dist = joined.getAs[Double]("distance")
    val speed = joined.getAs[Double]("speed")
    assert(math.abs(dist - 1.369339086269023) < 1e-9, s"distance $dist")  // haversine of the two stations
    assert(math.abs(speed - dist / (371.574 / 60 / 60)) < 1e-9, s"speed $speed")
  }

  test("malformed CSV rows land as nulls, not crashes (S1 permissive scan)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badcsv")
    val f = dir.resolve("rides.csv")
    java.nio.file.Files.writeString(f,
      """ride_id;rideable_type;started_at;ended_at;start_station_name;start_station_id;end_station_name;end_station_id;start_lat;start_lng;end_lat;end_lng;member_casual
        |GOOD1;electric_bike;2025-01-01 10:00:00.5;2025-01-01 10:10:00.5;A;1;B;2;40.7;-74.0;40.8;-74.1;member
        |BAD1;classic_bike;not-a-timestamp;2025-01-01 11:00:00;A;1;B;2;oops;-74.0;40.8;-74.1;casual
        |""".stripMargin)
    val rides = graft.etl.CityBike.readRides(spark, f.toString)
    assert(rides.count() == 2) // both rows survive the scan
    val bad = rides.filter(col("ride_id") === "BAD1").head
    assert(bad.isNullAt(bad.fieldIndex("started_at"))) // unparseable ts → null
    assert(bad.isNullAt(bad.fieldIndex("start_lat")))  // non-numeric double → null
    assert(bad.getAs[String]("member_casual") == "casual") // valid fields keep their values
    // and the downstream measure derivation tolerates the nulls
    val good = rides.filter(col("ride_id") === "GOOD1").head
    assert(good.getAs[java.sql.Timestamp]("started_at") != null)
    // the TYPED edges survive malformed rows too: a non-nullable Int in
    // the case classes made .as[T] NPE on exactly these inputs (null
    // date parts from the unparseable ts, null trip_duration)
    import sqlImplicits._
    import graft.schema.Schemas._
    val dd = graft.etl.CityBike.dateDimension(rides).as[DateDimension].collect()
    assert(dd.exists(_.year.isEmpty), "the null-date dim row deserializes")
    val m = graft.etl.CityBike.memberDimension(rides)
    val r = graft.etl.CityBike.rideableDimension(rides)
    val st = graft.etl.CityBike.stationDimension(rides)
    val fact = graft.etl.CityBike
      .rideFact(rides, m, r, st, graft.etl.CityBike.dateDimension(rides))
      .as[RideFact].collect()
    assert(fact.exists(_.trip_duration.isEmpty), "BAD1's fact row deserializes")
  }
}
