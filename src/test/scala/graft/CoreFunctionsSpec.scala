package graft

import org.apache.spark.sql.functions._

import graft.functions.CoreFunctions._

/** Unit + property tests for the core column combinators (SURVEY §5.2
  * items 1-2). Property cases are generated from a fixed seed — same
  * coverage every run, no scalatest/scalacheck bridge needed.
  */
class CoreFunctionsSpec extends SparkSpec {

  private def hav(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    import sqlImplicits._
    Seq((lat1, lng1, lat2, lng2)).toDF("a", "b", "c", "d")
      .select(haversineKm(col("a"), col("b"), col("c"), col("d"))).head.getDouble(0)
  }

  test("haversine: JFK-LAX is ~3974 km") {
    val d = hav(40.6413, -73.7781, 33.9416, -118.4085)
    assert(math.abs(d - 3974.0) < 15.0, s"got $d")
  }

  test("haversine: identity d(a,a) == 0") {
    assert(hav(40.0, -74.0, 40.0, -74.0) == 0.0)
  }

  test("haversine: symmetry and range (property, seeded)") {
    import sqlImplicits._
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(50)((
      rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 358 - 179,
      rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 358 - 179))
    val rows = cases.toDF("lat1", "lng1", "lat2", "lng2")
      .select(
        haversineKm(col("lat1"), col("lng1"), col("lat2"), col("lng2")).as("d1"),
        haversineKm(col("lat2"), col("lng2"), col("lat1"), col("lng1")).as("d2"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= math.Pi * EarthRadiusKm + 1e-6)
    }
  }

  test("durationSeconds keeps sub-second precision") {
    import sqlImplicits._
    val df = Seq(("2025-01-16 17:50:49.136", "2025-01-16 17:57:00.71"))
      .toDF("s", "e")
      .select(durationSeconds(to_timestamp(col("s")), to_timestamp(col("e"))).as("d"))
    assert(math.abs(df.head.getDouble(0) - 371.574) < 1e-9)
  }

  test("repairMeasure: null, NaN, ±Infinity all collapse to 0") {
    import sqlImplicits._
    val df = Seq(
      (Some(Double.NaN)), (Some(Double.PositiveInfinity)),
      (Some(Double.NegativeInfinity)), (None: Option[Double]), (Some(12.5)))
      .toDF("x").select(repairMeasure(col("x")).as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 0.0, 0.0, 0.0, 12.5))
  }

  test("speedKmh: zero duration repairs to 0, normal case divides") {
    import sqlImplicits._
    val df = Seq((10.0, 0.0), (10.0, 3600.0), (0.0, 0.0)).toDF("dist", "dur")
      .select(speedKmh(col("dist"), col("dur")).as("v"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 10.0, 0.0))
  }

  test("surrogateKey: deterministic, injective on natural keys, null-distinct") {
    import sqlImplicits._
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 1.0)).toDF("n", "v")
      .select(col("n"), surrogateKey(col("n"), col("v")).as("k"))
    val keys = df.collect().map(_.getString(1))
    assert(keys(0) == keys(1))           // stable
    assert(Set(keys: _*).size == 3)      // one key per distinct natural key
    val again = Seq(("a", 1.0)).toDF("n", "v").select(surrogateKey(col("n"), col("v"))).head.getString(0)
    assert(again == keys(0))             // stable across plans/runs
  }

  test("dateParts matches a known timestamp") {
    import sqlImplicits._
    val parts = dateParts(to_timestamp(lit("2024-12-31 23:46:42.36")))
    val row = Seq(1).toDF("x").select(parts.map { case (n, c) => c.as(n) }: _*).head
    assert(row.getInt(0) == 2024 && row.getInt(1) == 12 && row.getInt(2) == 4)
    assert(row.getInt(3) == 1)   // ISO week of 2024-12-31 is week 1 (of 2025)
    assert(row.getInt(4) == 31 && row.getInt(5) == 23 && row.getInt(6) == 46 && row.getInt(7) == 42)
  }

  test("dsum/davg are exact regardless of partitioning") {
    import sqlImplicits._
    val vals = (1 to 10000).map(i => i * 0.1)
    val one = vals.toDF("x").coalesce(1).agg(dsum(col("x"))).head.getDouble(0)
    val many = vals.toDF("x").repartition(16).agg(dsum(col("x"))).head.getDouble(0)
    assert(one == many) // bit-identical, not approximately equal
  }

  test("dsum/davg: NaN excluded from BOTH sides; out-of-domain raises") {
    import sqlImplicits._
    // NaN previously overflowed the DECIMAL(18,4) cast to a silent
    // NULL that sum() skipped while count(c) still counted it — the
    // mean read biased-low with no signal
    val r = Seq(1.0, 2.0, Double.NaN).toDF("x")
      .agg(dsum(col("x")).as("s"), davg(col("x")).as("a")).head
    assert(r.getDouble(0) == 3.0)
    assert(r.getDouble(1) == 1.5, "NaN must leave the denominator too")
    // a finite value outside DECIMAL(18,4) raises loudly (the
    // Stats.quantizable convention), not a silently-shrunken "exact" sum
    intercept[Exception] {
      Seq(1.0, 1e15).toDF("x").agg(dsum(col("x"))).head
    }
  }

  test("floorDiv/ceilDiv stay exact at the Long extremes (no silent wrap)") {
    import sqlImplicits._
    // num − pmod (and ceil's num + den − 1) ran in LongType: at the
    // extremes the shift wrapped and the quotient's sign flipped
    val r = Seq((Long.MinValue, 3L, Long.MaxValue, 10L)).toDF("a", "d1", "b", "d2")
      .select(
        floorDiv(col("a"), col("d1")).as("f"),
        ceilDiv(col("b"), col("d2")).as("c")).head
    assert(r.getLong(0) == Math.floorDiv(Long.MinValue, 3L), r.getLong(0).toString)
    assert(r.getLong(1) == ((BigInt(Long.MaxValue) + 9) / 10).toLong, r.getLong(1).toString)
  }

  test("leadingDigit == first char of the decimal string over the DECIMAL(18,4) domain") {
    import sqlImplicits._
    // the x131 replacement lemma: the integer compare/divide cascade
    // must read the same digit the old substring-of-string form read,
    // for every integer part a DECIMAL(18,4) can carry — boundaries
    // (10^k−1, 10^k, 10^k+1 for every threshold), 0, and a seeded
    // random sweep
    val boundary = (1 to 13).flatMap { k =>
      val p = math.pow(10, k).toLong
      Seq(p - 1, p, p + 1)
    }
    val rnd = new scala.util.Random(131)
    val random = Seq.fill(2000)(math.abs(rnd.nextLong()) % 100000000000000L)
    val rows = (Seq(0L, 1L, 9L, 99999999999999L) ++ boundary ++ random).toDF("n")
      .select(
        col("n"),
        leadingDigit(col("n")).as("fast"),
        substring(col("n").cast("string"), 1, 1).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .collect()
    assert(rows.isEmpty, rows.take(5).mkString(", "))
    // null propagates (a DECIMAL(18,4) cast overflow reaches the
    // cascade as null and must stay null, exactly like the string form)
    val r = Seq[java.lang.Long](null).toDF("n").select(leadingDigit(col("n"))).head
    assert(r.isNullAt(0))
  }
}
