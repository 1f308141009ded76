package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a broadcast Bloom sketch — the
  * scan-speed half of [[graft.operators.Dedup.bloomSemiJoin]].
  *
  * Why a custom Expression (SURVEY §4.3 escape hatch): the UDF form
  * boxes every key (string keys additionally pay UTF8String→String
  * conversion) and sits as a codegen black box in what is by design a
  * full-scan-rate filter. This probe stays inside whole-stage codegen
  * and hashes the UTF8String's UTF-8 bytes directly
  * (`mightContainBinary` — the same bytes `mightContainString` would
  * hash, no String materialization) or the primitive long.
  *
  * NULL keys probe to `false` (a bloom can't contain null), matching
  * the UDF it replaces. The sketch rides an explicit `Broadcast` so
  * the generated code reads executor-local bits; the expression holds
  * the broadcast handle, not the bits.
  */
case class BloomMightContain(child: Expression, bcBloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_might_contain requires a string or bigint key, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_bloom_might_contain"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else child.dataType match {
      case StringType => bcBloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
      case LongType => bcBloom.value.mightContainLong(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bcBloom, classOf[Broadcast[_]].getName)
    val bf = ctx.freshName("bloomFilter")
    val bfClass = classOf[BloomFilter].getName
    // The broadcast value is resolved once per generated class, not
    // per row.
    ctx.addImmutableStateIfNotExists(bfClass, bf, v => s"$v = ($bfClass) $bcRef.value();")
    val childGen = child.genCode(ctx)
    val probe = child.dataType match {
      case StringType => s"$bf.mightContainBinary(${childGen.value}.getBytes())"
      case LongType => s"$bf.mightContainLong(${childGen.value})"
    }
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = $probe;
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
