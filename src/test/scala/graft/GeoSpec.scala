package graft

import org.apache.spark.sql.functions._

import graft.functions.Geo

class GeoSpec extends SparkSpec {

  /** Independent JVM reference: the textbook bisection encoder. */
  private def referenceGeohash(lat: Double, lng: Double, precision: Int): String = {
    var (latLo, latHi) = (-90.0, 90.0)
    var (lngLo, lngHi) = (-180.0, 180.0)
    val sb = new StringBuilder
    var isLng = true
    var bits = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLng) {
        val mid = (lngLo + lngHi) / 2
        if (lng >= mid) { ch = (ch << 1) | 1; lngLo = mid } else { ch = ch << 1; lngHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      isLng = !isLng
      bits += 1
      if (bits == 5) { sb += Geo.Base32(ch); bits = 0; ch = 0 }
    }
    sb.toString
  }

  private def enc(lat: Double, lng: Double, p: Int): String = {
    import sqlImplicits._
    Seq((lat, lng)).toDF("lat", "lng")
      .select(Geo.geohash(col("lat"), col("lng"), p).as("g"))
      .collect().head.getString(0)
  }

  test("matches the published example and the bisection reference") {
    // Wikipedia's worked example (public): 57.64911, 10.40744 → u4pruydqqvj
    assert(enc(57.64911, 10.40744, 11) == "u4pruydqqvj")
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 25) {
      val lat = rnd.nextDouble() * 180 - 90
      val lng = rnd.nextDouble() * 360 - 180
      val p = 1 + rnd.nextInt(12)
      assert(enc(lat, lng, p) == referenceGeohash(lat, lng, p), s"($lat, $lng, $p)")
    }
  }

  test("boundary coordinates clamp instead of overflowing the bit range") {
    assert(enc(90.0, 180.0, 6) == referenceGeohash(math.nextDown(90.0), math.nextDown(180.0), 6))
    assert(enc(-90.0, -180.0, 6) == referenceGeohash(-90.0, -180.0, 6))
  }

  test("below-range coordinates clamp to the edge cell, not the opposite pole") {
    // GPS noise a hair below range quantized to −1, and shiftright(−1)
    // is all-ones: every interleave bit read 1 and the point silently
    // hashed to the +extreme cell — the opposite pole — so prefix
    // joins never saw its true neighbors (the upper edge was already
    // clamped; the lower wasn't)
    assert(enc(-90.000001, 0.0, 6) == enc(-90.0, 0.0, 6))
    assert(enc(0.0, -180.000001, 6) == enc(0.0, -180.0, 6))
    assert(enc(-90.1, -180.1, 6) == enc(-90.0, -180.0, 6))
  }

  test("nulls pass through") {
    import sqlImplicits._
    val got = Seq((Some(1.0), None: Option[Double])).toDF("lat", "lng")
      .select(Geo.geohash(col("lat"), col("lng"), 6).as("g")).collect().head
    assert(got.isNullAt(0))
  }

  test("a geohash projection stays inside whole-stage codegen") {
    import sqlImplicits._
    // The r14 Morton-spread rewrite exists for this: the per-bit
    // interleave form (40 shift/AND/multiply terms at precision 8)
    // pushed the generated method past hugeMethodLimit — every stage
    // containing a geohash ran interpreted AFTER paying a multi-second
    // janino compile of the giant class per invocation. The spread
    // form must keep the projection inside a codegen span.
    // spark.range, not a local Seq: ConvertToLocalRelation folds a
    // deterministic projection over a LocalRelation at planning time
    // and no codegen stage exists to assert on
    val df = spark.range(64)
      .select(Geo.geohash(col("id") * 1.0 - 32, col("id") * 2.0 - 64, 8).as("g"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      s"geohash projection fell out of whole-stage codegen:\n$plan")
  }

  test("prefix property: nearby points share cells, far points do not") {
    val a = enc(40.7306, -73.9866, 8) // Manhattan
    val b = enc(40.7312, -73.9871, 8) // a few hundred meters away
    val c = enc(51.5074, -0.1278, 8)  // London
    assert(a.take(5) == b.take(5), s"$a vs $b")
    assert(a.take(2) != c.take(2), s"$a vs $c")
  }
}
