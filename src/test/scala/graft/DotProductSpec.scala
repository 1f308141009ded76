package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.DotProduct

/** The native codegen'd dot product must agree bit-for-bit with the
  * interpreted higher-order-function fold it replaces.
  */
class DotProductSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  test("matches the HOF fold bit-for-bit on seeded random vectors") {
    import sqlImplicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b").select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null array yields null; empty arrays yield 0") {
    import sqlImplicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("mismatched lengths use the common prefix (HOF-fold parity)") {
    import sqlImplicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0)))
      .toDF("a", "b").select(VectorFunctions.dot(col("a"), col("b")).as("d"))
    assert(df.head.getDouble(0) == 50.0)
  }

  test("registered SQL function works and survives codegen") {
    DotProduct.register(spark)
    val out = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
    assert(out.head.getDouble(0) == 32.0)
  }
}
