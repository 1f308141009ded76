package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (SURVEY §2.7 W3 escape hatch,
  * `Aggregator[IN, BUF, OUT]`): element-wise mean of vectors — the
  * centroid computation of IVF-style indexing as a single-shuffle
  * aggregate with map-side partial merging, instead of the
  * posexplode → per-position avg → re-assemble dance.
  */
object VectorMean {

  final case class Buf(var sums: Array[Double], var n: Long)

  private val aggregator = new Aggregator[Seq[Double], Buf, Seq[Double]] {
    override def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

    override def reduce(b: Buf, v: Seq[Double]): Buf = {
      // udaf() does NOT filter null inputs the way built-in aggregates
      // do: a null array<double> row deserializes to a null Seq and
      // reached v.length as an uninformative NPE from inside codegen.
      // Skip it like avg() skips null scalars — a null vector is a
      // missing observation, not a ragged one.
      if (v == null) return b
      // init keyed on n (not sums.isEmpty): a zero-length FIRST vector
      // must pin the group's dimension at 0 so a later non-empty
      // vector errors as ragged instead of silently re-initializing
      if (b.n == 0) b.sums = new Array[Double](v.length)
      require(
        v.length == b.sums.length,
        s"vectorMean: ragged input — vector of dim ${v.length} in a group of dim ${b.sums.length}")
      var i = 0
      while (i < v.length) { b.sums(i) += v(i); i += 1 }
      b.n += 1
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        require(
          a.sums.length == b.sums.length,
          s"vectorMean: ragged input — merging partials of dim ${a.sums.length} and ${b.sums.length}")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.n += b.n
        a
      }
    }

    override def finish(b: Buf): Seq[Double] =
      if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq

    // vals + the memoized udaf below: stable encoder instances keep
    // re-constructed plans sameResult-equal (the HeavyHitters r12
    // finding)
    override val bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override val outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  private lazy val vectorMeanUdaf = udaf(aggregator)

  /** Column form: `vectorMean(vecCol)` inside any groupBy().agg(...). */
  def vectorMean(vec: Column): Column = vectorMeanUdaf(vec)
}
