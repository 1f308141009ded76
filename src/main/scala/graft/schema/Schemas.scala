package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Typed row models for the warehouse relations (SURVEY §1.4: Dataset[T]
  * case classes at the typed edges, DataFrame in the dynamic core).
  * The StructTypes are derived from the case classes so the two can
  * never drift.
  */
object Schemas {

  /** Raw ride row (check_and_create_db.py:96-113). */
  final case class Ride(
      ride_id: String,
      rideable_type: String,
      started_at: Timestamp,
      ended_at: Timestamp,
      start_station_name: Option[String],
      start_station_id: Option[String],
      end_station_name: Option[String],
      end_station_id: Option[String],
      start_lat: Option[Double],
      start_lng: Option[Double],
      end_lat: Option[Double],
      end_lng: Option[Double],
      member_casual: String)

  /** member/rideable dimension row (v4.py:65-83). */
  final case class TypeDimension(id: String, `type`: String)

  /** station dimension row (v4.py:127-137). */
  final case class StationDimension(
      id: String,
      name: Option[String],
      latitude: Option[Double],
      longitude: Option[Double])

  /** date dimension row (v4.py:109-125). The part fields are Option:
    * the permissive ETL admits malformed rows (an unparseable
    * started_at lands as a null timestamp — the CSV-recovery
    * contract), and the dimension's distinct() keeps one null-date
    * row whose parts are all null; a non-nullable Int here made
    * `.as[DateDimension]` NPE at the typed edge on exactly those
    * inputs while the docs claimed the schema "can never drift".
    */
  final case class DateDimension(
      id: String,
      date: Timestamp,
      year: Option[Int], month: Option[Int], quarter: Option[Int], week: Option[Int],
      day: Option[Int], hour: Option[Int], minute: Option[Int], second: Option[Int])

  /** fact row (v4.py:85-107); station FKs nullable (null join keys).
    * trip_duration is Option for the same malformed-row reason as
    * [[DateDimension]]: a ride with one unparseable timestamp has a
    * null duration (speed is repaired to 0 and stays non-null).
    */
  final case class RideFact(
      member_type_id: String,
      rideable_type_id: String,
      start_station_id: Option[String],
      end_station_id: Option[String],
      start_date_id: String,
      end_date_id: String,
      trip_duration: Option[Int],
      distance: Option[Double],
      speed: Double)

  val ride: StructType = Encoders.product[Ride].schema
  val typeDimension: StructType = Encoders.product[TypeDimension].schema
  val stationDimension: StructType = Encoders.product[StationDimension].schema
  val dateDimension: StructType = Encoders.product[DateDimension].schema
  val rideFact: StructType = Encoders.product[RideFact].schema
}
