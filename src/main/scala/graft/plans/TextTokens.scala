package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace tokenizer used by every text operator.
  *
  * Why a custom Expression (SURVEY §4.3 escape hatch): the built-in
  * formulation `filter(split(trim(text), "\\s+"), t -> length(t) > 0)`
  * contains a higher-order function — `CodegenFallback`, interpreted
  * per row, with a regex engine pass plus a lambda frame per token.
  * Tokenization is the innermost loop of the dedup/TF-IDF/quality
  * pipeline (shingling, token stats, fingerprints all start here), so
  * it gets the same treatment as the dot product: one codegen'd call
  * into a tight byte scanner, no regex, no per-token lambda.
  *
  * Semantics are byte-identical to the HOF form: Java's `\s` matches
  * only ASCII `[ \t\n\x0B\f\r]`, every empty string the split can
  * produce (leading/trailing/none) is dropped by the filter, and
  * interior tokens are exactly the maximal runs of non-whitespace
  * bytes. ASCII whitespace bytes never occur inside multi-byte UTF-8
  * sequences, so scanning raw bytes is Unicode-safe. The DuckDB oracle
  * equivalent (`list_filter(regexp_split_to_array(trim(text),'\s+'),
  * x -> length(x) > 0)`) is unchanged.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_tokens requires a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    TokenizeHelper.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TokenizeHelper.tokenize($s)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

object TokenizeHelper {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  /** Maximal runs of non-(ASCII-whitespace) bytes, as UTF8Strings. */
  def tokenize(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }
}

object WhitespaceTokens {

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_tokens"),
    new ExpressionInfo(classOf[WhitespaceTokens].getName, "graft_tokens"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1, s"graft_tokens takes 1 argument, got ${exprs.length}")
      WhitespaceTokens(exprs.head)
    })

  /** Register `graft_tokens` into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      functionDescription._1, functionDescription._2, functionDescription._3)
}
