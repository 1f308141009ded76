package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native dot product over two `array<double>` columns.
  *
  * Why a custom Expression (SURVEY §4.3 escape hatch): the built-in
  * formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a
  * higher-order function — `CodegenFallback`, interpreted per row,
  * allocating a lambda frame per element. This is the innermost loop
  * of every similarity operator (top-k, LSH, near-dup): a tight
  * codegen'd primitive-array loop with no allocation is the right
  * tool. Semantics match the HOF fold exactly (left-to-right sum of
  * products over the common prefix length), so results are
  * bit-identical and the DuckDB oracles still agree.
  *
  * Assumes element-non-null arrays (embedding vectors); a null array
  * yields null (`BinaryExpression` null-intolerant contract).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  private val info = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  /** Register `graft_dot` into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"), info, builder)
}

/** Config-based injection: `spark.sql.extensions=graft.plans.GraftExtensions`
  * makes `graft_dot` available in pure-SQL sessions too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      { exprs: Seq[Expression] => DotProduct(exprs.head, exprs(1)) }))
    ext.injectFunction(WhitespaceTokens.functionDescription)
    ext.injectFunction(JaroWinkler.functionDescription)
    ext.injectOptimizerRule(_ => HaversineBoundingBox)
  }
}
