package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group bounded top-k WITHOUT a window sort — the "best k
  * examples per bucket" selector of a training-data pipeline (top-k
  * documents per domain by quality score, top-k candidates per query,
  * hardest-k negatives per anchor).
  *
  * The standard formulation (`row_number() OVER (PARTITION BY g ORDER
  * BY score DESC) <= k`) shuffles EVERY row to its group's reducer and
  * sorts whole groups — at 100 TB a skewed group is a straggler and
  * the sort is O(|group| log |group|) for an answer of size k. This
  * operator instead runs a mergeable bounded heap as a typed
  * [[Aggregator]]: each map task keeps ≤2k candidates per group,
  * partial-merges map-side, and the shuffle carries AT MOST k rows per
  * (group, map partition) — the same partial-aggregation shape as a
  * `max()`, independent of group size. Merge is associative and
  * commutative (set-union then order-trim), so the result is
  * bit-deterministic under any partitioning: ties are broken by the
  * unique id ascending, making the selected set and its ranking
  * total-order-defined — and therefore DuckDB-replayable by the plain
  * window formulation as an exact oracle.
  */
object TopK {

  /** (score desc, id asc) — the total order. Sorting ASCENDING by
    * (-score, id) ranks best-first with deterministic tie-breaks.
    */
  private val best: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])

  private def trim(b: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    if (b.lengthCompare(k) <= 0) b.sorted(best) else b.sorted(best).take(k)

  /** Buffer: up to 2k unsorted candidates; the O(n log n) trim is
    * batched (amortized O(log k)/row), mirroring MisraGries.
    */
  private final class BoundedTopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
      val m = b :+ in
      if (m.size >= 2 * k) trim(m, k) else m
    }

    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b, k)

    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b, k)

    // vals + the memoized udaf below: stable encoder/input-encoder
    // instances are what make re-constructed plans compare sameResult
    // (the HeavyHitters r12 finding — fresh ExpressionEncoders carry
    // fresh ExprIds that canonicalization never normalizes)
    override val bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    override val outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }

  // One MEMOIZED udaf per k (aggregator instance + input encoder):
  // plan `sameResult`, hence OpCache warm reuse, needs the whole
  // ScalaAggregator expression stable across constructions.
  private val udafs = scala.collection.concurrent.TrieMap
    .empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Column form, usable inside any `agg(...)`: the k best
    * (score, id) pairs as an array of structs, best first. Null
    * scores/ids AND NaN scores must be filtered by the caller (typed
    * primitive input; the aggregator's total order ranks NaN above
    * every real score, so k NaN rows would displace all legitimate
    * winners — [[topKPerGroup]] applies exactly that filter and is
    * the form to prefer).
    */
  def topK(score: Column, id: Column, k: Int): Column = {
    require(k > 0, s"topK: k must be positive, got $k")
    udafs.getOrElseUpdate(k, udaf(new BoundedTopK(k))).apply(score, id)
  }

  /** The k best rows per group by `scoreCol` (desc, ties by `idCol`
    * asc): output `(groupCols*, rank, <idCol>, <scoreCol>)` with rank
    * 1-based. Rows with a null score or id are dropped (they cannot
    * participate in the total order). One bounded-width shuffle; no
    * window sort.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame = {
    // the aggregator keys ids as longs: a string id casts to null and
    // crashes the typed encoder; a fractional id silently truncates,
    // collapsing distinct ids and emitting ids that don't exist —
    // integral only, loudly (the md5WeightedSample guard, moved into
    // the shared operator)
    require(
      {
        import org.apache.spark.sql.types._
        Set[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(df.schema(idCol).dataType)
      },
      s"topKPerGroup: id column '$idCol' must be integral " +
        s"(got ${df.schema(idCol).dataType.simpleString})")
    val score = col(scoreCol).cast("double")
    val picked = df
      // NaN excluded: the aggregator's total order ranks NaN above
      // every real score, so k NaN rows would displace all legitimate
      // winners. `+ 0.0` collapses −0.0 to 0.0, matching the SQL/
      // window-formulation ordering (where −0.0 = 0.0 ties break by
      // id) instead of the Scala total order that ranks 0.0 > −0.0.
      .filter(score.isNotNull && !isnan(score) && col(idCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(topK(score + lit(0.0), col(idCol).cast("long"), k).as("__top"))
    picked
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(
        groupCols.map(col) ++ Seq(
          (col("pos") + 1).cast("int").as("rank"),
          col("col._2").as(idCol),
          col("col._1").as(scoreCol)): _*)
  }
}
