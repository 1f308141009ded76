package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** Histogram-quantile sketch: merge invariance, the one-bucket-width
  * error bound against exact percentiles, and edge clamping.
  */
class QuantileSketchSpec extends SparkSpec {

  private val (lo, hi, nb) = (0.0, 100.0, 50)
  private val width = (hi - lo) / nb

  private lazy val values: Seq[Double] =
    (1 to 500).map(i => (i * 37 % 1000) / 10.0) // deterministic spread over [0, 100)

  private lazy val df = {
    import sqlImplicits._
    values.zipWithIndex.map { case (v, i) => (if (i % 2 == 0) "a" else "b", v) }.toDF("k", "v")
  }

  test("merge of splits equals the single-pass state") {
    val full = QuantileSketch.rollup(df, Seq("k"), col("v"), lo, hi, nb)
    val merged = QuantileSketch.merge(
      Seq(df.limit(123), df.exceptAll(df.limit(123)))
        .map(b => QuantileSketch.rollup(b, Seq("k"), col("v"), lo, hi, nb)),
      Seq("k"))
    assert(merged.exceptAll(full).count() == 0 && full.exceptAll(merged).count() == 0)
  }

  test("estimates sit within one bucket width of the exact quantile") {
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val state = QuantileSketch.rollup(df, Seq("k"), col("v"), lo, hi, nb)
    val est = QuantileSketch.quantiles(state, Seq("k"), qs, lo, hi, nb)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (k <- Seq("a", "b"); q <- qs) {
      val sorted = values.zipWithIndex
        .filter { case (_, i) => (if (i % 2 == 0) "a" else "b") == k }
        .map(_._1).sorted
      // exact lower quantile: smallest x with rank >= q * n
      val exact = sorted(math.max(0, math.ceil(q * sorted.size).toInt - 1))
      val e = est((k, q))
      assert(exact >= e && exact < e + width,
        s"k=$k q=$q exact=$exact est=$e width=$width")
    }
  }

  test("decoding a state with mismatched bucketization raises") {
    // The state records (lo, hi, nb); reading buckets under different
    // parameters would silently shift every estimate. Must be loud.
    val state = QuantileSketch.rollup(df, Seq("k"), col("v"), lo, hi, nb)
    val e = intercept[Exception] {
      QuantileSketch.quantiles(state, Seq("k"), Seq(0.5), lo, hi * 2, nb).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(messages.contains("bucketized"), messages.take(300))
  }

  test("random splits and nested merges reproduce single-pass quantiles (property, seeded)") {
    import sqlImplicits._
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(300)(("k" + rnd.nextInt(3), rnd.nextDouble() * 100.0))
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    def quant(state: org.apache.spark.sql.DataFrame) =
      QuantileSketch.quantiles(state, Seq("k"), qs, lo, hi, nb)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val full = quant(QuantileSketch.rollup(data.toDF("k", "v"), Seq("k"), col("v"), lo, hi, nb))
    for (trial <- 1 to 4) {
      val shuffled = rnd.shuffle(data)
      val cut1 = rnd.nextInt(shuffled.size)
      val cut2 = cut1 + rnd.nextInt(shuffled.size - cut1 + 1)
      val states = Seq(
        shuffled.slice(0, cut1), shuffled.slice(cut1, cut2), shuffled.drop(cut2))
        .map(b => QuantileSketch.rollup(b.toDF("k", "v"), Seq("k"), col("v"), lo, hi, nb))
      val folded = states.reduce((a, b) => QuantileSketch.merge(Seq(a, b), Seq("k")))
      assert(quant(folded) === full, s"trial $trial diverged")
    }
  }

  test("NULL and NaN carry no quantile mass") {
    import sqlImplicits._
    val d = (Seq.fill(30)(Option(90.0)) ++ Seq.fill(20)(Option.empty[Double]) ++
      Seq.fill(20)(Option(Double.NaN)))
      .map(("a", _)).toDF("k", "v")
    val state = QuantileSketch.rollup(d, Seq("k"), col("v"), lo, hi, nb)
    // only the 30 real values count …
    assert(state.agg(sum("n")).head().getLong(0) == 30L)
    // … so the median sits at 90, not dragged toward lo by non-values
    val med = QuantileSketch.quantiles(state, Seq("k"), Seq(0.5), lo, hi, nb)
      .head().getDouble(2)
    assert(med == 90.0, s"median $med")
  }

  test("out-of-range values clamp to edge buckets; mass is never dropped") {
    import sqlImplicits._
    val d = Seq(("a", -50.0), ("a", 10.0), ("a", 500.0)).toDF("k", "v")
    val state = QuantileSketch.rollup(d, Seq("k"), col("v"), lo, hi, nb).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(state == Map(0L -> 1L, 5L -> 1L, (nb - 1).toLong -> 1L))
    assert(state.values.sum == 3L)
  }
}
