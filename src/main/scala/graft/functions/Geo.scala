package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash encoding (Niemeyer 2008, public domain spec) — the spatial
  * bucketing key that turns lat/lng proximity into PREFIX equality,
  * so spatial joins become equi-joins on truncated hashes (the same
  * blocked-join shape as the LSH family: bucket first, verify with
  * [[CoreFunctions.haversineKm]] inside the bucket).
  *
  * Pure integer/bit Column arithmetic: quantize each axis to
  * `5·precision / 2` bits (lng takes the extra bit — the even
  * interleave positions), interleave, then map 5-bit groups through
  * the base32 alphabet. The float quantization `(x+off)/span·2^bits`
  * is two IEEE ops — bit-identical in every engine — and everything
  * after is exact integers, so the SQL replay ([[geohashSql]]) is
  * generated from the same loop and can never diverge from the
  * Column form.
  */
object Geo {

  val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def bitSplit(precision: Int): (Int, Int) = {
    require(precision >= 1 && precision <= 12, s"geohash precision $precision out of [1, 12]")
    val total = 5 * precision
    val latBits = total / 2
    (total - latBits, latBits) // (lngBits, latBits)
  }

  /** Geohash of (lat, lng) at `precision` chars; null if either
    * coordinate is null.
    */
  def geohash(lat: Column, lng: Column, precision: Int = 8): Column = {
    val (lngBits, latBits) = bitSplit(precision)
    val total = lngBits + latBits
    // clamped at BOTH ends (the bucketize convention): a coordinate a
    // hair below range (GPS noise at lat = −90.000001) quantizes to −1,
    // and shiftright(−1, k) is all-ones — every bit of the interleave
    // reads 1 and the point silently hashes to the OPPOSITE extreme
    // cell, so prefix joins never find its true neighbors
    def quant(c: Column, off: Double, span: Double, bits: Int): Column =
      least(
        greatest(
          floor((c.cast("double") + lit(off)) / lit(span) * lit(math.pow(2, bits))).cast("long"),
          lit(0L)),
        lit((1L << bits) - 1))
    val latI = quant(lat, 90.0, 180.0, latBits)
    val lngI = quant(lng, 180.0, 360.0, lngBits)
    // interleave: lng fills even positions (MSB first), lat odd
    val terms =
      (0 until lngBits).map(j =>
        shiftright(lngI, lngBits - 1 - j).bitwiseAND(lit(1L)) * lit(1L << (total - 1 - 2 * j))) ++
      (0 until latBits).map(j =>
        shiftright(latI, latBits - 1 - j).bitwiseAND(lit(1L)) * lit(1L << (total - 2 - 2 * j)))
    val combined = terms.reduce(_ + _)
    val chars = (0 until precision).map { k =>
      lit(Base32).substr(
        (shiftright(combined, total - 5 * (k + 1)).bitwiseAND(lit(31L)) + 1).cast("int"),
        lit(1))
    }
    when(lat.isNull || lng.isNull, null).otherwise(concat(chars: _*))
  }

  /** DuckDB replay of [[geohash]], generated from the same bit loop,
    * in three staged expressions (embed each in its own CTE so the
    * quantized integers aren't textually repeated 40×):
    * `latIntSql`/`lngIntSql` over the raw coordinate columns,
    * `combineSql` over columns named `lati`/`lngi`, `charsSql` over a
    * column named `comb`.
    */
  def latIntSql(lat: String, precision: Int = 8): String = {
    val (_, latBits) = bitSplit(precision)
    quantSql(lat, "90.0", "180.0", latBits)
  }

  def lngIntSql(lng: String, precision: Int = 8): String = {
    val (lngBits, _) = bitSplit(precision)
    quantSql(lng, "180.0", "360.0", lngBits)
  }

  // GREATEST(…, 0) mirrors quant's below-range clamp — the two must
  // move together or the oracle agrees with the engine's bug
  private def quantSql(c: String, off: String, span: String, bits: Int): String =
    s"LEAST(GREATEST(CAST(FLOOR((CAST($c AS DOUBLE) + $off) / $span * ${math.pow(2, bits)}) AS BIGINT), 0), ${(1L << bits) - 1})"

  def combineSql(precision: Int = 8): String = {
    val (lngBits, latBits) = bitSplit(precision)
    val total = lngBits + latBits
    val terms =
      (0 until lngBits).map(j =>
        s"(((lngi >> ${lngBits - 1 - j}) & 1) * ${1L << (total - 1 - 2 * j)})") ++
      (0 until latBits).map(j =>
        s"(((lati >> ${latBits - 1 - j}) & 1) * ${1L << (total - 2 - 2 * j)})")
    terms.mkString("(", " + ", ")")
  }

  def charsSql(precision: Int = 8): String = {
    val total = 5 * precision
    (0 until precision)
      .map(k => s"substring('$Base32', CAST(((comb >> ${total - 5 * (k + 1)}) & 31) + 1 AS INT), 1)")
      .mkString(" || ")
  }
}
