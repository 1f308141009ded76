package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-scan column profiling — the data-quality/lineage snapshot a
  * warehouse emits on every load (row counts, null counts,
  * cardinalities, bounds, value-length stats per column).
  *
  * All per-column statistics fold into ONE aggregate over ONE scan —
  * the table is never read per column. With exact distincts Catalyst
  * plans the multi-distinct aggregate via Expand (row multiplication
  * ×|cols|, still a single scan); [[profileApprox]] swaps the
  * distincts for HLL `approx_count_distinct` so the whole profile is
  * one non-expanded pass — the 100 TB default, with exact mode kept
  * for oracle-checked runs.
  *
  * min/max are computed in the column's NATIVE type (ordering
  * semantics preserved) and only then rendered to string for the
  * uniform output schema; `avg_len` is the mean rendered length —
  * sum and count are exact integers, so the single division is
  * exactly rounded and bit-portable.
  */
object Profile {

  private def stats(c: String, exact: Boolean): Seq[Column] = {
    val distinct =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    Seq(
      count(col(c)).as(s"__nn_$c"),
      distinct.as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"),
      avg(length(col(c).cast("string"))).as(s"__len_$c"))
  }

  private def run(df: DataFrame, cols: Seq[String], exact: Boolean): DataFrame = {
    require(cols.nonEmpty, "profile: no columns requested")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(stats(_, exact))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        col(s"__len_$c").as("avg_len"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Exact profile of `cols`: one row per column,
    * `(col_name, n_rows, n_null, n_distinct, min_value, max_value,
    * avg_len)`. Single scan; exact distincts via Expand.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = run(df, cols, exact = true)

  /** Same shape with HLL distincts: one non-expanded pass — the
    * at-scale default (±~2% on n_distinct, everything else exact).
    */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame = run(df, cols, exact = false)
}
