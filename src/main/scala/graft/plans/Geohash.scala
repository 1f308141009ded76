package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geohash encoding (Niemeyer 2008, public-domain spec) as a native
  * codegen Expression — the `graft_dot` treatment for the spatial
  * bucketing key.
  *
  * WHY an Expression and not Column arithmetic (the r14 finding): the
  * Column form interleaves `5·precision` bits as one term per bit —
  * 40 shift/AND/multiply terms at precision 8, each re-inlining the
  * quantization subtree because Column expressions are TREES, not
  * DAGs — and the single output expression gets no cross-expression
  * subexpression elimination, so the generated method hit janino's
  * hard "Code grows beyond 64 KB" limit. Every stage containing a
  * geohash then ran with whole-stage codegen DISABLED, after paying a
  * multi-second janino compile of the giant class PER INVOCATION
  * (fresh expression ids defeat the codegen cache) — the x124/x130
  * erratic-timing root cause. (A Morton magic-mask rewrite in Column
  * land is worse: each of its five shift-or-mask steps references the
  * previous step twice, so the tree DOUBLES per step.) This form
  * generates one static call into a tight bit loop: constant code
  * size, always inside codegen, same bits.
  *
  * Arithmetic contract (shared verbatim with [[graft.functions.Geo]]'s
  * SQL replay, which the oracles embed): quantize each axis with
  * `floor((x+off)/span·2^bits)` — two IEEE ops then an exact floor —
  * clamped to [0, 2^bits−1] at BOTH ends (a below-range coordinate
  * must hash to the edge cell, not sign-extend to the opposite pole);
  * lng takes ⌈total/2⌉ bits and the even interleave positions from
  * the MSB, lat the rest; 5-bit groups map through the base32
  * alphabet. Null if either coordinate is null.
  */
case class Geohash(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression {

  require(precision >= 1 && precision <= 12,
    s"graft_geohash precision $precision out of [1, 12]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_geohash requires (double, double), got $other")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_geohash"

  override def nullSafeEval(a: Any, b: Any): Any =
    GeohashHelper.encode(a.asInstanceOf[Double], b.asInstanceOf[Double], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GeohashHelper.encode($a, $b, $precision)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Geohash =
    copy(left = newLeft, right = newRight)
}

object GeohashHelper {

  val Base32: String = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** floor((c+off)/span·2^bits) clamped to [0, 2^bits−1] — the same
    * IEEE op sequence as the SQL replay (`Geo.quantSql`), so engine
    * and oracle can never disagree on a boundary coordinate.
    */
  private def quant(c: Double, off: Double, span: Double, bits: Int): Long = {
    val q = math.floor((c + off) / span * math.pow(2, bits)).toLong
    math.min(math.max(q, 0L), (1L << bits) - 1)
  }

  def encode(lat: Double, lng: Double, precision: Int): UTF8String = {
    val total = 5 * precision
    val latBits = total / 2
    val lngBits = total - latBits
    val latI = quant(lat, 90.0, 180.0, latBits)
    val lngI = quant(lng, 180.0, 360.0, lngBits)
    // interleave: lng fills even positions (MSB first), lat odd
    var combined = 0L
    var j = 0
    while (j < lngBits) {
      combined |= ((lngI >> (lngBits - 1 - j)) & 1L) << (total - 1 - 2 * j)
      j += 1
    }
    j = 0
    while (j < latBits) {
      combined |= ((latI >> (latBits - 1 - j)) & 1L) << (total - 2 - 2 * j)
      j += 1
    }
    val out = new Array[Byte](precision)
    var k = 0
    while (k < precision) {
      out(k) = Base32.charAt(((combined >> (total - 5 * (k + 1))) & 31L).toInt).toByte
      k += 1
    }
    UTF8String.fromBytes(out)
  }
}

object Geohash {

  private val info = new ExpressionInfo(classOf[Geohash].getName, "graft_geohash")

  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"graft_geohash takes 3 arguments, got ${exprs.length}")
    val p = exprs(2) match {
      case Literal(v: Int, IntegerType) => v
      case other =>
        throw new IllegalArgumentException(
          s"graft_geohash precision must be an integer literal, got $other")
    }
    Geohash(exprs.head, exprs(1), p)
  }

  /** The ONE (identifier, info, builder) triple — both registration
    * paths share it (the DotProduct rule).
    */
  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_geohash"), info, builder)
}
