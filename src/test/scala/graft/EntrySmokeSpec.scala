package graft

/** The driver smoke-checks SparkEntry.entry(spark) with its own session
  * — which may have Spark 4 defaults (ANSI on). The flagship must
  * survive that.
  */
class EntrySmokeSpec extends SparkSpec {

  test("entry() returns rows under default-ANSI session settings") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = SparkEntry.entry(spark)
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("every declared query name is unique and every oracle has a query") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 46)
  }
}
