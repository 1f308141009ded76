package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

class TrianglesSpec extends SparkSpec {

  private def df(edges: Seq[(String, String)]) = {
    import sqlImplicits._
    edges.toDF("src", "dst")
  }

  /** Brute-force reference over node triples. */
  private def reference(edges: Seq[(String, String)]): Map[String, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      (x, i) <- nodes.zipWithIndex
      (y, j) <- nodes.zipWithIndex.drop(i + 1)
      z <- nodes.drop(j + 1)
      if und((x, y)) && und((y, z)) && und((x, z))
    } yield Seq(x, y, z)
    tris.flatten.groupBy(identity).map { case (v, l) => v -> l.size.toLong }
  }

  test("K4: every node sits in 3 triangles, total 4") {
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b } yield (a, b)
    val got = Triangles.perNode(df(k4))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    assert(Triangles.total(df(k4)).head().getLong(0) == 4L)
  }

  test("triangle-free graphs report nothing") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    assert(Triangles.perNode(df(path)).count() == 0)
    val bipartite = for { s <- Seq("s1", "s2"); c <- Seq("c1", "c2", "c3") } yield (s, c)
    assert(Triangles.perNode(df(bipartite)).count() == 0)
  }

  test("random graph matches the brute-force reference; duplicates/self-loops ignored") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
    val withNoise = edges ++ edges.take(50) // duplicates
    val got = Triangles.perNode(df(withNoise))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == reference(edges))
  }

  test("result is independent of partitioning and plan has no cartesian") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 200).map(_ => (s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}"))
    val one = Triangles.perNode(df(edges).coalesce(1)).collect().map(_.toSeq).toSet
    val many = Triangles.perNode(df(edges).repartition(13)).collect().map(_.toSeq).toSet
    assert(one == many)
    val plan = Triangles.perNode(df(edges)).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("clusteringCoeff: K4 is all-1, a path node with open wedge is 0") {
    // K4 plus a pendant path d—e—f: e has deg 2, no triangle → 0
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b } yield (a, b)
    val g = k4 ++ Seq(("d", "e"), ("e", "f"))
    val got = Triangles.clusteringCoeff(df(g))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("a") == ((3L, 3L, 1.0))) // deg 3, C(3,2)=3 wedges, 3 closed
    assert(got("d") == ((4L, 3L, 0.5))) // deg 4 → 6 wedges, 3 closed
    assert(got("e") == ((2L, 0L, 0.0)))
    assert(!got.contains("f")) // degree 1 — coefficient undefined
  }

  test("total on a triangle-free graph is 0, not a NULL that NPEs the caller") {
    import sqlImplicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(graft.operators.Triangles.total(path).head().getLong(0) == 0L)
  }
}
