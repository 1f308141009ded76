package graft

import org.apache.spark.sql.functions._

import graft.functions.CoreFunctions.haversineKm
import graft.plans.HaversineBoundingBox

/** The fused haversine Expression must match the composed built-in
  * form bit-for-bit, and the bounding-box rule must add only implied
  * predicates (same results, tighter plan).
  */
class HaversineSpec extends SparkSpec {

  private def composed(lat1: org.apache.spark.sql.Column, lng1: org.apache.spark.sql.Column,
                       lat2: org.apache.spark.sql.Column, lng2: org.apache.spark.sql.Column) = {
    val dLatH = radians(lat2 - lat1) / 2
    val dLngH = radians(lng2 - lng1) / 2
    lit(2.0) * lit(6371.0) * asin(sqrt(
      pow(sin(dLatH), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLngH), 2)))
  }

  test("fused expression is bit-identical to the composed built-ins") {
    import sqlImplicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((
      rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 358 - 179,
      rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 358 - 179))
    val df = rows.toDF("a", "b", "c", "d").select(
      haversineKm(col("a"), col("b"), col("c"), col("d")).as("fused"),
      composed(col("a"), col("b"), col("c"), col("d")).as("built"))
    assert(df.filter(col("fused") =!= col("built")).count() == 0)
  }

  test("bounding-box rule adds implied range predicates without changing results") {
    import sqlImplicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HaversineBoundingBox
    try {
      // a real parquet scan: LocalRelation would be folded eagerly and
      // leave no Filter to rewrite (and no scan to push into)
      val dir = java.nio.file.Files.createTempDirectory("graft-geo").toString
      (1 to 5000).map { i =>
        (i.toLong, (i % 179 - 89).toDouble, (i % 359 - 179).toDouble)
      }.toDF("id", "lat", "lng").write.mode("overwrite").parquet(dir)
      val pts = spark.read.parquet(dir)
      val q = pts.filter(haversineKm(lit(40.0), lit(-74.0), col("lat"), col("lng")) < 1000.0)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains(">=") && optimized.contains("<="),
        s"expected added range predicates in:\n$optimized")
      val executed = q.queryExecution.executedPlan.toString
      assert(executed.contains("PushedFilters: [IsNotNull(lat)") || executed.contains("GreaterThanOrEqual(lat"),
        s"expected lat bounds pushed to scan in:\n$executed")
      // identical rows to the unoptimized semantic (recompute directly)
      val expected = pts.collect().filter { r =>
        graft.plans.HaversineDistance.compute(40.0, -74.0, r.getDouble(1), r.getDouble(2)) < 1000.0
      }.map(_.getLong(0)).toSet
      assert(q.collect().map(_.getLong(0)).toSet == expected)
      assert(expected.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == HaversineBoundingBox)
    }
  }

  test("a NaN radius is not rewritten (hav < NaN is TRUE; a NaN bound is FALSE)") {
    import sqlImplicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HaversineBoundingBox
    try {
      val pts = Seq((1L, 41.0, 10.0), (2L, -50.0, 100.0)).toDF("id", "lat", "lng")
      // Spark orders NaN above every value, so this predicate keeps
      // ALL rows; the old `r <= 0` guard let NaN through to boundsFor,
      // whose Literal(NaN) bounds rejected every row instead
      val hits = pts
        .filter(haversineKm(lit(41.0), lit(10.0), col("lat"), col("lng")) < Double.NaN)
        .count()
      assert(hits == 2L, s"NaN radius must leave the filter semantics alone, got $hits")
      // and a plain negative radius still bails (no bounds, 0 matches)
      val neg = pts
        .filter(haversineKm(lit(41.0), lit(10.0), col("lat"), col("lng")) < -1.0)
        .count()
      assert(neg == 0L)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == HaversineBoundingBox)
    }
  }

  test("rule skips longitude bounds when the box would cross the antimeridian") {
    import sqlImplicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HaversineBoundingBox
    try {
      val pts = Seq((1L, 41.0, -179.5), (2L, 41.0, 179.5), (3L, -50.0, 10.0))
        .toDF("id", "lat", "lng")
      // center lng near -180: box wraps → lng bounds must be omitted,
      // so the wrapped point at +179.5 (a true neighbor) still matches.
      val hits = pts
        .filter(haversineKm(lit(41.0), lit(-179.9), col("lat"), col("lng")) < 200.0)
        .collect().map(_.getLong(0)).toSet
      assert(hits == Set(1L, 2L), s"got $hits")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == HaversineBoundingBox)
    }
  }
}
