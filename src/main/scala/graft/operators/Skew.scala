package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE's skew-join split handles sort-merge
  * joins at runtime; explicit salting remains the tool for the cases
  * AQE cannot re-plan — severely skewed aggregation state, or hash
  * joins where one key dominates a partition beyond executor memory.
  */
object Skew {

  /** Salted inner equi-join: the left (large, skewed) side derives a
    * deterministic salt in [0, saltFactor) from `saltSource` (any
    * left-side column with spread — a row id, a timestamp); the right
    * side is replicated saltFactor× so every (key, salt) bucket finds
    * its match. Result set is identical to `left.join(right, key)`;
    * the hot key's rows are spread over saltFactor partitions.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltSource: Column,
      saltFactor: Int = 8): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val r = right.withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: aggregate
    * per (key, salt) first — spreading the hot key's rows — then
    * combine the partials. Caller supplies both phases; for algebraic
    * aggregates (sum/count/min/max) phase2 is the same function over
    * the partial column.
    */
  def saltedAggregate(
      df: DataFrame,
      key: String,
      saltSource: Column,
      saltFactor: Int)(
      phase1: org.apache.spark.sql.RelationalGroupedDataset => DataFrame)(
      phase2: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val partial = phase1(salted.groupBy(col(key), col("__salt")))
    phase2(partial.groupBy(col(key)))
  }
}
