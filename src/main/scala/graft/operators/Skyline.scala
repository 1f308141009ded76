package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — Börzsönyi et al., ICDE 2001
  * (public): the rows not dominated by any other row, maximizing both
  * dimensions (a row dominates another when it is ≥ in both and > in
  * at least one). The multi-objective shortlist query: "price vs
  * freshness", "quality score vs length", "coverage vs cost".
  *
  * Sort-based formulation: in (x desc, y desc, id) order a row is on
  * the frontier iff no EARLIER row has y ≥ its y — one running-max
  * window. Exact duplicates keep their first (lowest-id)
  * representative; ties that differ in one dimension resolve by
  * dominance as usual.
  *
  * Scale shape: two phases. Phase 1 partitions by an x-range bucket
  * and takes per-bucket skylines IN PARALLEL (each bucket's window
  * sorts only its own rows); phase 2 runs the same window globally
  * over the per-bucket survivors. Phase-1 filtering is sound (a
  * dominated-in-bucket row is dominated globally) and complete (its
  * dominator survives its own bucket or is dominated by something
  * that does), so the result is exactly the one-pass skyline while
  * the global sort only ever sees survivors — frontier-sized per
  * bucket, not corpus-sized. Worst case (all points on the frontier)
  * degrades to the global sort; real distributions shrink ~n → ~√n.
  */
object Skyline {

  def skyline2D(
      df: DataFrame,
      xCol: String,
      yCol: String,
      idCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"skyline2D: buckets must be positive, got $buckets")
    // NaN excluded like null (the TopK guard): under NaN-is-largest
    // ordering one NaN yCol row makes the running max NaN — `NaN < y`
    // is false for every later row, so the rest of the frontier is
    // silently suppressed and the NaN row itself reads as a "skyline"
    // member; a NaN xCol row sorts first and dominates everything.
    // Type-gated: only float/double columns can carry NaN.
    def notNaN(c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        !isnan(col(c))
      case _ => lit(true)
    }
    val clean = df.filter(
      col(xCol).isNotNull && col(yCol).isNotNull && col(idCol).isNotNull &&
        notNaN(xCol) && notNaN(yCol))

    def localPass(in: DataFrame, part: Seq[String]): DataFrame = {
      val w = Window
        .partitionBy(part.map(col): _*)
        .orderBy(col(xCol).desc, col(yCol).desc, col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("__prev_max_y", max(col(yCol)).over(w))
        .filter(col("__prev_max_y").isNull || col("__prev_max_y") < col(yCol))
        .drop("__prev_max_y")
    }

    // phase 1: per-bucket skyline, buckets by ntile-free range hash of
    // x (width_bucket needs bounds we don't have; a percent-range
    // bucket via min/max broadcast keeps phase 1 balanced)
    val bounds = clean.agg(
      min(col(xCol)).cast("double").as("__lo"), max(col(xCol)).cast("double").as("__hi"))
    val bucketed = clean
      .crossJoin(broadcast(bounds))
      .withColumn(
        "__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(
            lit(buckets - 1),
            floor((col(xCol).cast("double") - col("__lo")) /
              ((col("__hi") - col("__lo")) / lit(buckets))).cast("int"))))
    val local = localPass(bucketed, Seq("__bkt"))
    // phase 2: global pass over survivors only
    localPass(local.drop("__bkt", "__lo", "__hi"), Seq.empty)
  }
}
