package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage

class SortedNeighborhoodSpec extends SparkSpec {

  test("each record pairs with exactly its w successors inside the block") {
    import sqlImplicits._
    val df = Seq(
      ("b1", 1L, "alpha"), ("b1", 2L, "beta"), ("b1", 3L, "gamma"), ("b1", 4L, "delta"),
      ("b2", 5L, "x"))
      .toDF("blk", "id", "name")
    val out = RecordLinkage.sortedNeighborhood(df, "id", col("name"), col("blk"), w = 2)
      .orderBy("block", "id_a", "offset")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(5)))
    // b1 name order: alpha(1) beta(2) delta(4) gamma(3)
    assert(out.toSeq == Seq(
      ("b1", 1L, 2L, 1), ("b1", 1L, 4L, 2),
      ("b1", 2L, 4L, 1), ("b1", 2L, 3L, 2),
      ("b1", 4L, 3L, 1)))
    // b2 has one record → no pairs; total = 3+2 from b1 minus trailing = 5
  }

  test("sort-key ties are totalized by id: neighbor sets are deterministic") {
    import sqlImplicits._
    val df = Seq(("b", 3L, "same"), ("b", 1L, "same"), ("b", 2L, "same")).toDF("blk", "id", "k")
    val one = RecordLinkage
      .sortedNeighborhood(df.coalesce(1), "id", col("k"), col("blk"), w = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val many = RecordLinkage
      .sortedNeighborhood(df.repartition(7), "id", col("k"), col("blk"), w = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(one == Set((1L, 2L), (2L, 3L)))
    assert(one == many)
  }
}
