package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {

  /** JVM replica of the scaled-integer spec. */
  private def reference(
      edges: Set[(String, String)], iters: Int, d100: Long): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val teleport = (PageRank.Scale * (100 - d100) / 100) / n
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val mass = edges.toSeq
        .map { case (s, t) => t -> r(s) / out(s) }
        .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).sum }
      r = nodes.map(v => v -> (teleport + mass.getOrElse(v, 0L) * d100 / 100)).toMap
    }
    r
  }

  private val petersenish: Set[(String, String)] = {
    // a small undirected graph with a clear hub (h touches everything)
    val spokes = (1 to 6).map(i => ("h", s"v$i")).toSet
    val ring = (1 to 6).map(i => (s"v$i", s"v${i % 6 + 1}")).toSet
    (spokes ++ ring).flatMap { case (a, b) => Set((a, b), (b, a)) }
  }

  private def edgeDf = {
    import sqlImplicits._
    petersenish.toSeq.toDF("src", "dst")
  }

  test("ranks equals the integer-spec reference exactly") {
    for (iters <- Seq(1, 3, 5)) {
      val got = PageRank.ranks(edgeDf, iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == reference(petersenish, iters, 85L), s"iters=$iters")
    }
  }

  test("the hub outranks every spoke and mass stays near Scale") {
    val got = PageRank.ranks(edgeDf, 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert((1 to 6).forall(i => got("h") > got(s"v$i")))
    val total = got.values.sum
    // floor rounding leaks < ~1 unit per node per round
    assert(total <= PageRank.Scale && total > PageRank.Scale - 100L, s"total=$total")
  }

  test("result is independent of partitioning (integer sums)") {
    val a = PageRank.ranks(edgeDf.coalesce(1), 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = PageRank.ranks(edgeDf.repartition(9), 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("undirected doubles edges so no node dangles") {
    import sqlImplicits._
    val directed = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val und = PageRank.undirected(directed)
    assert(und.count() == 4)
    val out = PageRank.ranks(und, 3)
    // every node keeps rank above the bare teleport floor
    val teleport = (PageRank.Scale * 15 / 100) / 3
    assert(out.collect().forall(_.getLong(1) > teleport))
  }
}
