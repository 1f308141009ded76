package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CityBikeQueries, CoreQueries, ExtQueries, ExtQueries2}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def allQueries = {
    val qs = CoreQueries.all ++ ExtQueries.all ++ ExtQueries2.all ++ CityBikeQueries.all
    // a duplicated name would silently drop one query at `.toMap` —
    // the shadowed query simply stops being verified, with no signal
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    qs
  }

  /** Flagship query (SURVEY §7.2): average trip duration, distance and
    * speed per member type per month, through the full star-schema
    * build on the Citi Bike sample. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "cb01_member_month_rollup").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    allQueries.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
