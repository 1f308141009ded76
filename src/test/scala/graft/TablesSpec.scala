package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.{IntegerType, TimestampType}

import graft.sources.Tables

/** Catalog + sink operators (SURVEY S2/S3/S4, D1-D3) against the
  * session catalog with a temp warehouse dir.
  */
class TablesSpec extends SparkSpec {

  test("database bootstrap: probe + create is idempotent") {
    // Own database name: graft_test_db is shared with StreamingSpec's
    // upsert test, and suites run in parallel — asserting its global
    // non-existence was order-dependent.
    val db = "graft_probe_db"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    assert(!Tables.databaseExists(spark, db))
    Tables.createDatabase(spark, db)
    Tables.createDatabase(spark, db) // IF NOT EXISTS
    assert(Tables.databaseExists(spark, db))
  }

  test("append/overwrite sinks have to_sql append/replace semantics") {
    import sqlImplicits._
    Tables.createDatabase(spark, "graft_test_db")
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Tables.overwriteTable(df, "graft_test_db.t1")
    assert(spark.table("graft_test_db.t1").count() == 2)
    Tables.appendTable(df, "graft_test_db.t1")
    assert(spark.table("graft_test_db.t1").count() == 4) // append accumulates
    Tables.overwriteTable(df, "graft_test_db.t1")
    assert(spark.table("graft_test_db.t1").count() == 2) // replace resets
  }

  test("typed sink applies the dtype-override map before writing") {
    import sqlImplicits._
    Tables.createDatabase(spark, "graft_test_db")
    val df = Seq(("2024-01-01 10:00:00", "41.5")).toDF("ts", "x")
    Tables.writeTyped(
      df, "graft_test_db.t2",
      Map("ts" -> TimestampType, "x" -> IntegerType),
      SaveMode.Overwrite)
    val out = spark.table("graft_test_db.t2")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.schema("x").dataType == IntegerType)
    assert(out.head.getInt(1) == 41)
  }

  test("upsert replaces matching keys and keeps the rest") {
    import sqlImplicits._
    Tables.createDatabase(spark, "graft_test_db")
    Tables.overwriteTable(
      Seq((1, "old1"), (2, "old2"), (3, "old3")).toDF("id", "v"),
      "graft_test_db.up_t")
    Tables.upsertTable(
      Seq((2, "new2"), (4, "new4")).toDF("id", "v"),
      "graft_test_db.up_t", "id")
    val out = spark.table("graft_test_db.up_t")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "old1", 2 -> "new2", 3 -> "old3", 4 -> "new4"))
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    import sqlImplicits._
    Tables.createDatabase(spark, "graft_test_db")
    val fact = (1 to 1000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
    val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")
    Tables.writeBucketed(fact, "graft_test_db.fact_b", 8, "k")
    Tables.writeBucketed(dim, "graft_test_db.dim_b", 8, "k")
    val joined = spark.table("graft_test_db.fact_b")
      .hint("merge") // force SMJ so the bucket layout, not broadcast, is exercised
      .join(spark.table("graft_test_db.dim_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 1000)
  }

  test("partitioned table prunes partitions for partition-column predicates") {
    import sqlImplicits._
    Tables.createDatabase(spark, "graft_test_db")
    val df = (1 to 300).map(i => (i, s"2024-01-${i % 3 + 1}")).toDF("id", "day")
    Tables.writePartitioned(df, "graft_test_db.part_t", Seq("day"))
    val q = spark.table("graft_test_db.part_t").filter($"day" === "2024-01-2")
    assert(q.count() == 100)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-2"),
      s"expected partition pruning in:\n$scan")
  }

  test("date-partitioned rides publish prunes to one day's partitions") {
    import org.apache.spark.sql.functions._
    Tables.createDatabase(spark, "graft_test_db")
    val rides = graft.etl.CityBike.build(spark).rides
      .withColumn("ride_date", to_date(col("started_at")))
    Tables.writePartitioned(rides, "graft_test_db.rides_by_day", Seq("ride_date"))
    val oneDay = spark.table("graft_test_db.rides_by_day")
      .filter(col("ride_date") === "2025-01-16")
    assert(oneDay.count() > 0)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2025-01-16"),
      s"expected day-level pruning in:\n$plan")
  }

  test("dynamic partition pruning: dim-side filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.functions._
    import sqlImplicits._
    Tables.createDatabase(spark, "graft_test_db")
    val fact = (0 until 2000).map(i => (i.toLong, i % 10, i * 1.5)).toDF("id", "day", "v")
    Tables.writePartitioned(fact, "graft_test_db.dpp_fact", Seq("day"))
    // The dim must be a file-backed table: a local relation would fold
    // the filter away and leave no selective predicate for the DPP
    // optimizer rule to key on.
    Tables.overwriteTable(
      (0 until 10).map(i => (i, if (i < 2) "keep" else "drop")).toDF("day_key", "tag"),
      "graft_test_db.dpp_dim")
    val dim = spark.table("graft_test_db.dpp_dim").where(col("tag") === "keep")
    // The filter lives on the DIM side only — static pruning can't see
    // it. DPP must inject a runtime subquery filter into the fact scan
    // so only 2 of 10 partitions are read (the 100 TB star-join
    // pattern: never scan fact partitions the dim filter excludes).
    val joined = spark.table("graft_test_db.dpp_fact")
      .join(dim, col("day") === col("day_key"))
    assert(joined.count() == 400)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a dynamic-pruning subquery on the fact scan in:\n$plan")
  }

  test("json-lines round-trip preserves rows; corrupt lines null-land under the declared schema") {
    import sqlImplicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val d = Seq((1L, "alpha", "en"), (2L, "beta", "es"), (3L, "gamma", "zh"))
      .toDF("doc_id", "text", "lang")
    Tables.writeJsonLines(d, s"$dir/docs")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val back = Tables.readJsonLines(spark, s"$dir/docs", schema)
    assert(back.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      == Seq((1L, "alpha", "en"), (2L, "beta", "es"), (3L, "gamma", "zh")))
    // malformed line: PERMISSIVE mode lands nulls, never throws
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.json"), "{\"doc_id\": oops not json\n")
    val bad = Tables.readJsonLines(spark, s"$dir/bad.json", schema).collect()
    assert(bad.length == 1 && bad.head.isNullAt(0))
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    import sqlImplicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val d = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0))
      .toDF("id", "name", "score")
    Tables.writeOrc(d, s"$dir/t")
    val back = Tables.readOrc(spark, s"$dir/t")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0)))
    // Same pushdown contract as parquet: the predicate must reach the
    // ORC scan, not evaluate post-scan only.
    val plan = back.filter($"id" > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)"), plan)
  }

  test("citybike warehouse bootstrap lands all five star tables") {
    val wh = graft.etl.CityBike.build(spark)
    Tables.bootstrapCityBike(spark, wh, db = "citybike_test")
    assert(spark.table("citybike_test.member_dimension").count() == 2)
    assert(spark.table("citybike_test.rideable_dimension").count() == 2)
    assert(spark.table("citybike_test.station_dimension").count() == 172)
    assert(spark.table("citybike_test.date_dimension").count() == 101201)
    assert(spark.table("citybike_test.ride_fact").count() == 50611)
    // catalog round-trip: a warehouse query over the managed tables
    val joined = spark.table("citybike_test.ride_fact")
      .join(
        spark.table("citybike_test.member_dimension")
          .withColumnRenamed("id", "member_type_id"),
        "member_type_id")
    assert(joined.count() == 50611)
  }

  test("stagedOverwrite publishes by rename; the drop-to-rename crash window heals") {
    import sqlImplicits._
    val tbl = "graft_staged_t"
    Seq(tbl, tbl + "__staging").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Tables.overwriteTable((1 to 10).toDF("v"), tbl)
    // overwrite with a plan that READS the table — the self-read case
    // the staging table exists for; the publish must be the rename
    // path (no staging left behind, content exact)
    Tables.stagedOverwrite(spark.table(tbl).withColumn("v", org.apache.spark.sql.functions.col("v") * 2), tbl)
    assert(spark.table(tbl).collect().map(_.getInt(0)).sorted.toSeq == (1 to 10).map(_ * 2))
    assert(!spark.catalog.tableExists(tbl + "__staging"), "staging must be renamed away")
    // crash window: target dropped, staging holds the complete result —
    // recoverStaged must republish it (also by rename) exactly once
    Tables.overwriteTable((1 to 5).toDF("v"), tbl + "__staging")
    spark.sql(s"DROP TABLE $tbl")
    assert(Tables.recoverStaged(spark, tbl), "orphaned staging must be healed")
    assert(spark.table(tbl).collect().map(_.getInt(0)).sorted.toSeq == (1 to 5))
    assert(!spark.catalog.tableExists(tbl + "__staging"))
    assert(!Tables.recoverStaged(spark, tbl), "nothing left to heal")
    Seq(tbl, tbl + "__staging").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("compaction rewrites an append-accreted table into few files with content intact") {
    import sqlImplicits._
    val tbl = "graft_compact_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}__staging")
    for (b <- 1 to 6)
      Tables.appendTable((b * 100 until b * 100 + 50).toDF("v").repartition(2), tbl)
    val before = spark.table(tbl).collect().map(_.getInt(0)).sorted
    val (nBefore, nAfter) = Tables.compactTable(spark, tbl, targetBytes = 1L << 30)
    assert(nBefore >= 6, s"append should accrete files, saw $nBefore")
    assert(nAfter < nBefore && nAfter >= 1, s"$nBefore -> $nAfter")
    val after = spark.table(tbl).collect().map(_.getInt(0)).sorted
    assert(after.toSeq == before.toSeq)
  }

  test("partition retention drops old partitions metadata-only and keeps the rest") {
    import sqlImplicits._
    val tbl = "graft_retention_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val rows = Seq(
      ("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3), ("2024-01-04", 4))
      .flatMap { case (d, v) => (1 to 3).map(i => (d, v * 10 + i)) }
    Tables.writePartitioned(rows.toDF("day", "v"), tbl, Seq("day"))
    val dropped = Tables.expirePartitions(spark, tbl, "day", cutoff = "2024-01-03")
    assert(dropped == 2, s"dropped $dropped")
    val left = spark.table(tbl).select("day").distinct().collect().map(_.getString(0)).sorted
    assert(left.toSeq == Seq("2024-01-03", "2024-01-04"), left.toSeq.toString)
    assert(spark.table(tbl).count() == 6)
    // idempotent: nothing else to expire at the same cutoff
    assert(Tables.expirePartitions(spark, tbl, "day", cutoff = "2024-01-03") == 0)
  }

  test("ANALYZE TABLE populates catalog statistics (row count + column min/max/ndv)") {
    import sqlImplicits._
    val tbl = "graft_stats_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Tables.overwriteTable((1 to 1000).map(i => (i, s"v$i")).toDF("k", "s"), tbl)
    spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(tbl))
    val st = meta.stats.get
    assert(st.rowCount.contains(BigInt(1000)), st.toString)
    val kStats = st.colStats("k")
    assert(kStats.min.contains(1) || kStats.min.map(_.toString).contains("1"), kStats.toString)
    assert(kStats.max.map(_.toString).contains("1000"), kStats.toString)
    assert(kStats.distinctCount.exists(_.toInt > 900), kStats.toString)
  }

  test("schemaDiff classifies added/removed/type/nullability changes, empty when compatible") {
    import org.apache.spark.sql.types._
    val expected = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("v", DoubleType, nullable = true),
      StructField("gone", IntegerType, nullable = true)))
    val actual = StructType(Seq(
      StructField("id", LongType, nullable = true),        // relaxed: breaking
      StructField("name", StringType, nullable = false),   // tightened: fine
      StructField("v", StringType, nullable = true),       // type change
      StructField("extra", DateType, nullable = true)))    // added
    val got = graft.sources.Tables.schemaDiff(expected, actual)
    assert(got == Seq(
      ("extra", "added", "", "date"),
      ("gone", "removed", "int", ""),
      ("id", "nullability_relaxed", "required", "nullable"),
      ("v", "type_changed", "double", "string")))
    assert(graft.sources.Tables.schemaDiff(expected, expected).isEmpty)
  }

  test("JDBC sink round-trips append/replace through an embedded Derby database") {
    // The reference's real sink is JDBC (check_and_create_db_v4.py:151,
    // 295: to_sql append/replace over psycopg2). No Postgres server
    // ships in this environment, but Derby does (on the Spark
    // classpath for the metastore) — an embedded `jdbc:derby:memory:`
    // database exercises the ACTUAL writeJdbc call path, Spark's JDBC
    // relation, and both SaveModes over a real java.sql wire, no
    // server needed.
    import sqlImplicits._
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val rows = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    def readBack() = spark.read.jdbc(url, "graft_jdbc_t", props)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    try {
      // S3 replace semantics
      Tables.writeJdbc(rows.toDF("id", "name", "v"), url, "graft_jdbc_t", props, SaveMode.Overwrite)
      assert(readBack() == rows.toSet)
      // S2 append semantics
      Tables.writeJdbc(
        Seq((4L, "d", 4.5)).toDF("id", "name", "v"), url, "graft_jdbc_t", props, SaveMode.Append)
      assert(readBack() == (rows :+ ((4L, "d", 4.5))).toSet)
      // replace again drops the old content entirely
      Tables.writeJdbc(
        Seq((9L, "z", 9.5)).toDF("id", "name", "v"), url, "graft_jdbc_t", props, SaveMode.Overwrite)
      assert(readBack() == Set((9L, "z", 9.5)))
    } finally {
      // dropping an in-memory Derby db SIGNALS success via SQLException
      // 08006 ("database dropped") — the documented shutdown contract
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftjdbc;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("every catalog sink notifies write listeners — the invariant is structural, not per-sink convention") {
    import sqlImplicits._
    // JVM-level caches over catalog state (the fold path's
    // compaction-marker negative cache) rely on "any in-JVM catalog
    // write of X notifies for X" holding for EVERY sink in this
    // object, including the crash-recovery rename. Registration is
    // permanent by design; the listener filters on this test's table
    // prefix so it stays inert for the rest of the session.
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    Tables.registerWriteListener((_, t) => if (t.startsWith("tl_notify_")) seen.add(t))
    def fired(t: String): Boolean = seen.contains(t)
    val df = Seq((1L, "a")).toDF("k", "v")
    def cleanup(): Unit = Seq("app", "ow", "typed", "bkt", "part", "ups", "st", "rec", "pub")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS tl_notify_$s"))
    cleanup()
    try {
      Tables.appendTable(df, "tl_notify_app")
      Tables.overwriteTable(df, "tl_notify_ow")
      Tables.writeTyped(df, "tl_notify_typed",
        Map("k" -> org.apache.spark.sql.types.IntegerType))
      Tables.writeBucketed(df, "tl_notify_bkt", 2, "k")
      Tables.writePartitioned(df, "tl_notify_part", Seq("v"))
      Tables.stagedOverwrite(df, "tl_notify_st")
      Tables.overwriteTable(df, "tl_notify_ups")
      Tables.upsertTable(Seq((1L, "b")).toDF("k", "v"), "tl_notify_ups", "k")
      Tables.publishChecked(df, "tl_notify_pub",
        Seq(graft.operators.Expectations.NotNull("k_not_null", Seq("k"))))
      // crash-recovery rename materializes the table — must notify too
      Tables.overwriteTable(df, "tl_notify_rec__staging")
      spark.sql("DROP TABLE IF EXISTS tl_notify_rec")
      seen.remove("tl_notify_rec") // ignore any earlier notification
      assert(Tables.recoverStaged(spark, "tl_notify_rec"))
      val expected = Seq("app", "ow", "typed", "bkt", "part", "st", "ups", "pub", "rec")
        .map(s => s"tl_notify_$s")
      val missing = expected.filterNot(fired)
      assert(missing.isEmpty, s"sinks that bypassed the write listener: $missing")
    } finally cleanup()
  }

  test("upsert: null keys replace (null-safe match) and a crashed staged publish heals at entry") {
    import sqlImplicits._
    val tbl = "graft_upnull_t"
    Seq("", "__staging").foreach(s => spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
    Tables.overwriteTable(
      Seq((Some(1), "a"), (None, "x")).toDF("id", "v"), tbl)
    // null = null is null in SQL, so a plain-equality anti join would
    // KEEP the existing null-key row and the union would append the
    // update's — every upsert of a null key duplicating instead of
    // replacing
    Tables.upsertTable(Seq((Option.empty[Int], "y")).toDF("id", "v"), tbl, "id")
    val rows = spark.table(tbl).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getString(1)).toSeq
    assert(rows.sortBy(_._2) == Seq(Some(1) -> "a", None -> "y"),
      s"null-key upsert must REPLACE the existing null-key row, got ${rows.toList}")
    // crashed staged publish (target dropped, staging complete): the
    // next upsert must heal it instead of throwing on the missing table
    spark.table(tbl).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(tbl + "__staging")
    spark.sql(s"DROP TABLE $tbl")
    Tables.upsertTable(Seq((Some(1), "a2")).toDF("id", "v"), tbl, "id")
    val healed = spark.table(tbl).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getString(1)).toSeq
    assert(healed.sortBy(_._2) == Seq(Some(1) -> "a2", None -> "y"))
    Seq("", "__staging").foreach(s => spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
  }

  test("compaction preserves a partitioned table's layout and skips when already compact") {
    import sqlImplicits._
    val tbl = "graft_compactp_t"
    Seq("", "__staging").foreach(s => spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
    // fragment: 6 non-partition-aligned tasks spray files into every
    // partition directory
    val rows = Seq("a", "b", "c").flatMap(d => (1 to 30).map(i => (d, i)))
    rows.toDF("day", "v").repartition(6)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").partitionBy("day").saveAsTable(tbl)
    def content() = spark.table(tbl).select("day", "v")
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted
    val before = content()
    val (nBefore, nAfter) = Tables.compactTable(spark, tbl, targetBytes = 1L << 30)
    // the old flat listing read 0 files for a partitioned table and
    // the rewrite FLATTENED the layout (partition pruning lost)
    assert(nBefore > 3, s"fragmented table should have >3 files, saw $nBefore")
    assert(nAfter == 3, s"one file per partition expected, got $nAfter")
    assert(spark.sql(s"SHOW PARTITIONS $tbl").count() == 3,
      "compaction must preserve the partition layout")
    assert(content().toSeq == before.toSeq)
    // already compact: no rewrite, no drop-rename crash window
    val (b2, a2) = Tables.compactTable(spark, tbl, targetBytes = 1L << 30)
    assert(b2 == 3 && a2 == 3)
    Seq("", "__staging").foreach(s => spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
  }

  test("compaction handles a MULTI-column partition layout (recursive listing)") {
    import sqlImplicits._
    val tbl = "graft_compactp2_t"
    Seq("", "__staging").foreach(s => spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
    // two partition columns: files live TWO directory levels below the
    // root — the fixed one-level descent measured 0 parquet files here
    // and compaction silently no-opped (the r12 ADVICE finding)
    val rows = for (d <- Seq("a", "b"); h <- 1 to 2; i <- 1 to 20) yield (d, h, i)
    rows.toDF("day", "hour", "v").repartition(5)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").partitionBy("day", "hour").saveAsTable(tbl)
    def content() = spark.table(tbl).select("day", "hour", "v")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    val before = content()
    val (nBefore, nAfter) = Tables.compactTable(spark, tbl, targetBytes = 1L << 30)
    assert(nBefore > 4, s"fragmented 2-level table should list >4 files, saw $nBefore")
    assert(nAfter == 4, s"one file per leaf partition expected, got $nAfter")
    assert(spark.sql(s"SHOW PARTITIONS $tbl").count() == 4,
      "compaction must preserve the two-level partition layout")
    assert(content().toSeq == before.toSeq)
    val (b2, a2) = Tables.compactTable(spark, tbl, targetBytes = 1L << 30)
    assert(b2 == 4 && a2 == 4, "second call must skip the rewrite")
    Seq("", "__staging").foreach(s => spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
  }

  test("partition retention compares integer-like partition values numerically") {
    import sqlImplicits._
    val tbl = "graft_retnum_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val rows = (7 to 12).flatMap(h => (1 to 2).map(i => (Some(h), h * 10 + i))) :+
      (Option.empty[Int], 999) // null hour → __HIVE_DEFAULT_PARTITION__
    Tables.writePartitioned(rows.toDF("hour", "v"), tbl, Seq("hour"))
    // lexicographic ordering would read "10","11","12" < "9" and
    // irreversibly drop CURRENT partitions
    // the Hive null-partition sentinel must neither expire nor (as a
    // non-numeric value against a numeric cutoff) blow up the whole
    // TTL call — it is unordered, so it is always retained
    val dropped = Tables.expirePartitions(spark, tbl, "hour", cutoff = "9")
    assert(dropped == 2, s"only hours 7 and 8 expire below 9, dropped $dropped")
    val left = spark.table(tbl).select("hour").distinct()
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).sorted
    assert(left.toSeq == Seq(-1, 9, 10, 11, 12), left.toSeq.toString)
    // MIXED ordering fails loudly: a non-numeric cutoff against a
    // numeric-partitioned table would compare inconsistently
    // (lexicographic fallback per value) and drop the wrong partitions
    // — retention is irreversible, so it must raise instead
    val err = intercept[IllegalArgumentException] {
      Tables.expirePartitions(spark, tbl, "hour", cutoff = "2024-01-01T00")
    }
    assert(err.getMessage.contains("cannot order partition value"), err.getMessage)
    assert(spark.table(tbl).select("hour").distinct().count() == 5,
      "a failed expire must not have dropped anything (4 hours + the null partition)")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("partition retention refuses a multi-level layout instead of silently no-opping") {
    import sqlImplicits._
    val tbl = "graft_retml_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // two-level specs read "day=…/hour=…": the parsed `day` value
    // carries the "/hour=…" suffix, the generated DROP PARTITION never
    // matches, and DROP IF EXISTS swallowed it — TTL was a silent
    // permanent no-op on exactly the layout class big fact tables use
    val rows = for (d <- Seq("2024-01-01", "2024-06-01"); h <- Seq(1, 2)) yield (d, h, 1)
    Tables.writePartitioned(rows.toDF("day", "hour", "v"), tbl, Seq("day", "hour"))
    val err = intercept[IllegalArgumentException] {
      Tables.expirePartitions(spark, tbl, "day", cutoff = "2024-03-01")
    }
    assert(err.getMessage.contains("multi-level"), err.getMessage)
    assert(spark.sql(s"SHOW PARTITIONS $tbl").count() == 4,
      "a refused expire must not have dropped anything")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("dropManaged under a non-default current database deletes the right directory") {
    import sqlImplicits._
    Tables.createDatabase(spark, "graft_dm_db")
    val clone = spark.newSession()
    clone.catalog.setCurrentDatabase("graft_dm_db")
    spark.sql("DROP TABLE IF EXISTS default.graft_dm_t")
    spark.sql("DROP TABLE IF EXISTS graft_dm_db.graft_dm_t")
    Tables.overwriteTable(Seq((1, "default")).toDF("k", "src"), "default.graft_dm_t")
    // write via the CLONE's current database — unqualified name
    locally {
      val df = { import clone.implicits._; Seq((2, "dbqualified")).toDF("k", "src") }
      Tables.overwriteTable(df, "graft_dm_t")
    }
    // the name-convention location resolved unqualified names against
    // the DEFAULT database: this would have deleted default.graft_dm_t's
    // directory while leaving graft_dm_db's to collide on recreate
    Tables.dropManaged(clone, "graft_dm_t")
    assert(!clone.catalog.tableExists("graft_dm_t"))
    assert(spark.table("default.graft_dm_t").head().getString(1) == "default",
      "dropManaged must not touch the unrelated default-db table's data")
    // the dropped table's directory really is gone: recreate succeeds
    locally {
      val df = { import clone.implicits._; Seq((3, "recreated")).toDF("k", "src") }
      Tables.overwriteTable(df, "graft_dm_t")
    }
    assert(spark.table("graft_dm_db.graft_dm_t").head().getString(1) == "recreated")
    spark.sql("DROP TABLE IF EXISTS default.graft_dm_t")
    spark.sql("DROP TABLE IF EXISTS graft_dm_db.graft_dm_t")
  }

  test("schemaDiff matches names case-insensitively by default, exactly when asked") {
    import org.apache.spark.sql.types._
    val expected = StructType(Seq(StructField("id", LongType)))
    val actualUpper = StructType(Seq(StructField("ID", LongType)))
    // Spark resolves case-insensitively by default — "ID" for "id" is
    // compatible, not a removed+added pair that blocks a publish
    assert(Tables.schemaDiff(expected, actualUpper).isEmpty)
    val strict = Tables.schemaDiff(expected, actualUpper, caseSensitive = true)
    assert(strict.map(_._2).sorted == Seq("added", "removed"))
    // type changes still surface under the case-insensitive match
    val actualTyped = StructType(Seq(StructField("ID", IntegerType)))
    assert(Tables.schemaDiff(expected, actualTyped).map(_._2) == Seq("type_changed"))
  }
}
