package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused haversine great-circle distance (km) as a single codegen'd
  * Expression — replaces a 13-node tree of built-ins with one kernel,
  * and gives the optimizer rule below a stable node to pattern-match.
  *
  * The arithmetic is ordered exactly like the composed built-in form
  * (check_and_create_db_v4.py:300-313 / CoreFunctions.haversineKm
  * history): `2*R*asin(sqrt(sin²(Δlat/2) + cos·cos·sin²(Δlng/2)))`
  * with `java.lang.Math` throughout — results are bit-identical to the
  * built-in composition, so all oracle comparisons are unaffected.
  */
case class HaversineDistance(lat1: Expression, lng1: Expression, lat2: Expression, lng2: Expression)
    extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lng1
  override def third: Expression = lat2
  override def fourth: Expression = lng2

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_haversine_km"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_haversine_km requires four double arguments")

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineDistance.compute(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"2.0 * ${HaversineDistance.EarthRadiusKm} * java.lang.Math.asin(java.lang.Math.sqrt(" +
        s"java.lang.Math.pow(java.lang.Math.sin(java.lang.Math.toRadians($c - $a) / 2), 2) + " +
        s"java.lang.Math.cos(java.lang.Math.toRadians($a)) * java.lang.Math.cos(java.lang.Math.toRadians($c)) * " +
        s"java.lang.Math.pow(java.lang.Math.sin(java.lang.Math.toRadians($d - $b) / 2), 2)))")

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression, third: Expression, fourth: Expression): HaversineDistance =
    copy(lat1 = first, lng1 = second, lat2 = third, lng2 = fourth)
}

object HaversineDistance {
  val EarthRadiusKm = 6371.0

  def compute(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double =
    2.0 * EarthRadiusKm * math.asin(math.sqrt(
      math.pow(math.sin(math.toRadians(lat2 - lat1) / 2), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(math.toRadians(lng2 - lng1) / 2), 2)))
}

/** Optimizer rule (SURVEY §4.3's named candidate): a radius predicate
  * `graft_haversine_km(lat0, lng0, lat, lng) < r` with a literal
  * center gains conjunctive bounding-box range predicates on the lat/
  * lng expressions. The box is a strict superset of the disc, so
  * semantics are unchanged — but the simple comparisons push into
  * parquet scans (row-group skipping) and run before the trig kernel.
  * Longitude bounds are skipped when the box would cross ±180° or a
  * pole (the conservative superset is then latitude-only).
  *
  * PRECONDITION: coordinates normalized to [−90, 90] / [−180, 180] —
  * the geographic contract every consumer here satisfies. Haversine
  * itself is periodic in Δlng, so an UN-normalized coordinate (lng =
  * 360°) could satisfy the distance predicate while failing the plain
  * range bound; the superset claim holds only on the normalized
  * domain (the same precondition every geo index assumes).
  * Idempotent: bounds already present are not re-added, so the
  * optimizer reaches fixpoint.
  */
object HaversineBoundingBox extends Rule[LogicalPlan] with PredicateHelper {

  import HaversineDistance.EarthRadiusKm

  private def boundsFor(
      center: (Double, Double), lat: Expression, lng: Expression, r: Double): Seq[Expression] = {
    // NaN must bail like r ≤ 0, NOT fall through: `hav < NaN` is TRUE
    // for every row under Spark's NaN-is-largest ordering, while a
    // Literal(NaN) bound (`lat >= NaN`) is FALSE for every row — the
    // rewrite would flip an always-true predicate to always-false.
    if (r.isNaN || r <= 0) return Nil
    val (lat0, lng0) = center
    // +1e-12 RELATIVE pad on the latitude half-width: along a meridian
    // the analytic bound is exactly tight (distance = R·Δlat), so a
    // few ulps of kernel rounding (pow/sin/asin) could otherwise admit
    // a point through `hav < r` that the un-padded `lat <= lat0+dLat`
    // conjunct rejects — rows dropped only with the rule enabled. The
    // pad dwarfs float error while staying ~0.1 µm of pruning slack;
    // nextUp/nextDown absorb the outer addition's own rounding. The
    // longitude bound needs no pad: its cosMin (cos at the box's
    // extreme latitude) is strictly below cos(lat) for every admitted
    // point, which is analytic slack already.
    val dLat = math.toDegrees(r / EarthRadiusKm) * 1.000000000001
    val latBounds = Seq(
      GreaterThanOrEqual(lat, Literal(Math.nextDown(lat0 - dLat))),
      LessThanOrEqual(lat, Literal(Math.nextUp(lat0 + dLat))))
    val maxAbsLat = math.min(90.0, math.abs(lat0) + dLat)
    val cosMin = math.cos(math.toRadians(maxAbsLat))
    val lngBounds =
      if (cosMin <= 1e-9) Nil
      else {
        val dLng = math.toDegrees(r / (EarthRadiusKm * cosMin))
        if (lng0 + dLng > 180.0 || lng0 - dLng < -180.0) Nil
        else Seq(
          GreaterThanOrEqual(lng, Literal(lng0 - dLng)),
          LessThanOrEqual(lng, Literal(lng0 + dLng)))
      }
    latBounds ++ lngBounds
  }

  private def derive(conjuncts: Seq[Expression]): Seq[Expression] = conjuncts.flatMap {
    case LessThan(h: HaversineDistance, Literal(r: Double, DoubleType)) => fromNode(h, r)
    case LessThanOrEqual(h: HaversineDistance, Literal(r: Double, DoubleType)) => fromNode(h, r)
    case GreaterThan(Literal(r: Double, DoubleType), h: HaversineDistance) => fromNode(h, r)
    case GreaterThanOrEqual(Literal(r: Double, DoubleType), h: HaversineDistance) => fromNode(h, r)
    case _ => Nil
  }

  // The coordinate expressions are DUPLICATED into the new conjuncts,
  // so they must be deterministic — a nondeterministic lat/lng would
  // re-draw in the bound and drop rows the original predicate keeps
  // (the guard every built-in predicate-inference rule carries).
  private def fromNode(h: HaversineDistance, r: Double): Seq[Expression] = (h.lat1, h.lng1, h.lat2, h.lng2) match {
    case (Literal(a: Double, DoubleType), Literal(b: Double, DoubleType), lat, lng)
        if !lat.foldable && lat.deterministic && lng.deterministic =>
      boundsFor((a, b), lat, lng, r)
    case (lat, lng, Literal(a: Double, DoubleType), Literal(b: Double, DoubleType))
        if !lat.foldable && lat.deterministic && lng.deterministic =>
      boundsFor((a, b), lat, lng, r)
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // PredicateHelper's standard And-flattening, not a hand-rolled copy
      val conjuncts = splitConjunctivePredicates(cond)
      val fresh = derive(conjuncts)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
        // and against EACH OTHER: two semantically equal haversine
        // predicates in one filter would otherwise emit the same four
        // bounds twice, evaluated per row forever after
        .foldLeft(Seq.empty[Expression])((acc, b) =>
          if (acc.exists(_.semanticEquals(b))) acc else acc :+ b)
      if (fresh.isEmpty) f
      else Filter((conjuncts ++ fresh).reduce(And), child)
  }
}
