package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** IO layer (SURVEY §7.1 item 2): sources, sinks, catalog bootstrap —
  * the engine-native replacements for the reference's pandas/psycopg2
  * plumbing (SURVEY §2.1 / §2.8).
  */
object Tables {

  /** S1 generalization: CSV source with explicit schema (never
    * inference — determinism) and configurable delimiter.
    * Reference: create_db_from_csv.py:10.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType, sep: String = ";"): DataFrame =
    spark.read.option("header", "true").option("sep", sep).schema(schema).csv(path)

  /** Parquet source; `nanos-as-long` timestamp columns are normalized
    * back to microsecond timestamps (driver fixture quirk).
    */
  def readParquet(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == LongType =>
        acc.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case (acc, _) => acc
    }
  }

  /** JSON-lines source with an explicit schema (never inference — a
    * schema-inference pass reads the whole input twice and locks in
    * whatever types the first sample happened to contain). Corrupt
    * lines land in `_corrupt_record` when the schema declares it,
    * PERMISSIVE-null otherwise — same malformed-row contract as the
    * CSV source.
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines sink — the interchange format of training-data
    * pipelines (one document per line, splittable when uncompressed,
    * schema-on-read for downstream consumers).
    */
  def writeJsonLines(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC source/sink — the second columnar interchange format (Hive
    * ecosystems standardize on it); same pushdown/pruning behavior as
    * parquet through the datasource V2 scan, so queries are
    * format-agnostic.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** D1: database-exists probe (check_and_create_db.py:23). */
  def databaseExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.databaseExists(name)

  /** D2: CREATE DATABASE IF NOT EXISTS (check_and_create_db.py:28). */
  def createDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")

  /** S2: append sink — the engine-native analogue of
    * `to_sql(..., if_exists='append')` (create_db_from_csv.py:14).
    */
  def appendTable(df: DataFrame, table: String): Unit = {
    df.write.mode(SaveMode.Append).format("parquet").saveAsTable(table)
    notifyWrite(df, table)
  }

  // Observers notified after ANY catalog-table sink in this object
  // lands (append, overwrite, typed, bucketed, partitioned, staged/
  // upsert publishes, gated publish) — the hook JVM-level caches over
  // catalog state need to stay sound: a memoized "table X does not
  // exist" (e.g. the fold path's compaction-marker negative cache)
  // must be invalidated when THIS JVM writes X through the generic
  // sinks, STRUCTURALLY, not by convention on whichever sink today's
  // marker writers happen to use. Path sinks (json/orc/jdbc) create
  // no catalog entry and are deliberately outside the contract.
  // Registration is idempotent by construction (object initializers
  // run once); listeners must be cheap and non-throwing.
  private val writeListeners =
    new java.util.concurrent.CopyOnWriteArrayList[(SparkSession, String) => Unit]()

  def registerWriteListener(f: (SparkSession, String) => Unit): Unit =
    writeListeners.add(f)

  private def notifyWrite(df: DataFrame, table: String): Unit =
    notifyWrite(df.sparkSession, table)

  private def notifyWrite(spark: SparkSession, table: String): Unit = {
    val it = writeListeners.iterator()
    while (it.hasNext) it.next()(spark, table)
  }

  /** S3: overwrite sink — `to_sql(..., if_exists='replace')`
    * (check_and_create_db_v4.py:295). Spark's overwrite drops and
    * recreates the table — same DDL-loss caveat, here harmless.
    */
  def overwriteTable(df: DataFrame, table: String): Unit = {
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
    notifyWrite(df, table)
  }

  /** S4: typed sink — the SQLAlchemy dtype-map override
    * (check_and_create_db_v4.py:217-234) becomes explicit casts
    * applied before the write.
    */
  def writeTyped(df: DataFrame, table: String, types: Map[String, DataType], mode: SaveMode = SaveMode.Append): Unit = {
    val cast = df.columns.foldLeft(df) { (acc, c) =>
      types.get(c).map(t => acc.withColumn(c, col(c).cast(t))).getOrElse(acc)
    }
    cast.write.mode(mode).format("parquet").saveAsTable(table)
    notifyWrite(df, table)
  }

  /** Bucketed managed table: pre-shuffled on the join/agg key so
    * co-located joins between same-bucketed tables need no Exchange —
    * the 100 TB answer to repeated fact⋈dim joins on one key.
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, bucketCol: String, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet").bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
    notifyWrite(df, table)
  }

  /** Hive-style partitioned table: partition pruning turns predicates
    * on the partition column into directory pruning at planning time.
    */
  def writePartitioned(df: DataFrame, table: String, partitionCols: Seq[String]): Unit = {
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .partitionBy(partitionCols: _*).saveAsTable(table)
    notifyWrite(df, table)
  }

  /** Upsert (merge-by-key) into a managed parquet table: existing rows
    * with a matching key are replaced by the update rows, others are
    * kept — completing the append/replace pair with the third write
    * mode warehouses need. Implemented as anti-join + union + staged
    * overwrite (parquet has no transactional MERGE; at warehouse scale
    * prefer [[graft.streaming.EventStreams.foldSnapshotBatch]]'s
    * bucket-partitioned layout, which rewrites only touched buckets
    * instead of the whole table). The union is staged first —
    * overwriting a table that feeds its own plan would read-after-drop.
    */
  def upsertTable(updates: DataFrame, table: String, key: String): Unit = {
    val spark = updates.sparkSession
    val merged = spark.table(table)
      .join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates)
    stagedOverwrite(merged, table)
  }

  /** Overwrite `table` with a plan that (possibly) READS `table`:
    * materialize to a staging table first, then publish by RENAME — a
    * direct overwrite would drop the table out from under its own
    * scan. The staging table is the crash-recovery artifact: the
    * publish is drop-then-rename (parquet has no atomic swap), so a
    * crash there loses `table` while `<table>__staging` still holds
    * the complete result — [[recoverStaged]] restores it on the next
    * run.
    */
  def stagedOverwrite(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val staging = table + "__staging"
    overwriteTable(df, staging)
    // Metadata-only publish (the publishChecked pattern): RENAME the
    // staged table onto the target instead of re-writing its data — a
    // staged overwrite otherwise writes every byte TWICE, which at
    // warehouse scale doubles the I/O of every fold/upsert/compaction.
    // Crash window unchanged: between the DROP and the RENAME the
    // target is missing while `__staging` holds the complete result —
    // exactly the state [[recoverStaged]] heals.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    spark.catalog.refreshTable(table)
    // the overwriteTable above notified for `__staging`; the content
    // LANDS under `table` via the rename — notify for that name too,
    // so listener invariants ("any in-JVM write of X invalidates
    // caches over X") hold structurally for the published name
    notifyWrite(df, table)
  }

  /** Crash recovery for [[stagedOverwrite]]: if `table` is missing but
    * its staging table survives, the previous run died between the
    * staging write and the final copy — the staging table IS the
    * intended content; restore it. Returns true if a recovery ran.
    */
  def recoverStaged(spark: SparkSession, table: String): Boolean = {
    val staging = table + "__staging"
    val needed = !spark.catalog.tableExists(table) && spark.catalog.tableExists(staging)
    if (needed) {
      // the staged table IS the complete result — publish by rename
      // (metadata-only), same as the stagedOverwrite happy path
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
      spark.catalog.refreshTable(table)
      // a recovery MATERIALIZES `table` — notify like any other sink
      // so the listener invariant covers the crash path too
      notifyWrite(spark, table)
    }
    needed
  }

  /** Write-audit-publish: stage `df`, validate the STAGED data against
    * `expectations`, and only then move it to `table` — the gated
    * publish a warehouse runs so a bad load can never shadow a good
    * table (the reference's Postgres constraints rejected bad rows at
    * insert; Spark validates the staged batch as a whole instead).
    * Returns the violation report; on any failing expectation the
    * target table is left UNTOUCHED and the staging table is kept for
    * inspection.
    */
  def publishChecked(
      df: DataFrame,
      table: String,
      expectations: Seq[graft.operators.Expectations.Expectation]): DataFrame = {
    require(expectations.nonEmpty, "publishChecked with no expectations — nothing would be audited")
    val spark = df.sparkSession
    // Heal a previous publish that died between its DROP and final
    // RENAME (target missing, validated batch on `__staging`) BEFORE
    // touching anything: without this, the crash window depended on
    // some OTHER caller running recoverStaged, and the `__staging`
    // drop below would destroy the only surviving validated copy.
    recoverStaged(spark, table)
    val staging = table + "__audit"
    overwriteTable(df, staging)
    // A prior publish's dropped staging table can leave a stale
    // relation/file-index cache under the same name — refresh before
    // reading what was just written.
    spark.catalog.refreshTable(staging)
    val staged = spark.table(staging)
    // Materialize the report BEFORE deciding: the lazy plan reads the
    // staging table, which a successful publish renames away — a
    // caller evaluating the returned report later would read a
    // dropped table.
    val report = graft.operators.Expectations.check(staged, expectations).localCheckpoint(true)
    val failed = report.filter(!org.apache.spark.sql.functions.col("pass")).count()
    if (failed == 0) {
      // Metadata-only swap, not a second data write: re-writing the
      // validated batch into the target would double the I/O AND leave
      // a drop-then-rewrite window where a crash destroys the
      // previously-good table. The validated batch is first renamed
      // onto the `__staging` suffix so the drop→rename gap is covered
      // by the SAME crash recovery as [[stagedOverwrite]]: a crash
      // between the DROP and the final RENAME leaves `table` missing
      // with `<table>__staging` holding the validated content —
      // exactly the state [[recoverStaged]] heals. (The `__audit`
      // suffix survives only on a FAILED publish, where the target was
      // never touched, so it needs no recovery path.)
      val ready = table + "__staging"
      spark.sql(s"DROP TABLE IF EXISTS $ready")
      spark.sql(s"ALTER TABLE $staging RENAME TO $ready")
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"ALTER TABLE $ready RENAME TO $table")
      notifyWrite(df, table)
    }
    report
  }

  /** Drop a managed table AND its on-disk location. An ephemeral
    * catalog (fresh derby/in-memory metastore per run) forgets tables
    * while their warehouse directories survive — the next CREATE under
    * the same name then fails with LOCATION_ALREADY_EXISTS even though
    * `DROP TABLE IF EXISTS` reported nothing to drop. State-table
    * consumers that must be re-runnable across sessions reset through
    * this.
    */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    // Managed layout: <warehouse>/<table> for the default database,
    // <warehouse>/<db>.db/<table> for a named one.
    val rel = table.toLowerCase(java.util.Locale.ROOT).split('.') match {
      case Array(t) => t
      case Array(db, t) => s"$db.db/$t"
      case parts => throw new IllegalArgumentException(
        s"dropManaged: cannot resolve location for '$table' (${parts.length} name parts)")
    }
    val p = new org.apache.hadoop.fs.Path(wh, rel)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Small-file compaction for a managed parquet table: rewrite into
    * ⌈bytes / targetBytes⌉ files through the crash-safe
    * [[stagedOverwrite]] path. The append sink accretes one file set
    * per micro-batch/job — at 100 TB the resulting listing and
    * open-file overhead dominates scan setup long before data volume
    * does; periodic compaction is the warehouse's GC. Returns
    * (files_before, files_after).
    */
  def compactTable(spark: SparkSession, table: String, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"compactTable: targetBytes must be positive, got $targetBytes")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    val p = new org.apache.hadoop.fs.Path(meta.location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles() = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles()
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val data = spark.table(table).repartition(nOut)
    stagedOverwrite(data, table)
    (before.size, parquetFiles().size)
  }

  /** Retention enforcement for a partitioned managed table: drop
    * whole partitions of `partCol` strictly below `cutoff` via
    * metadata-only DDL (`ALTER TABLE … DROP PARTITION`) — no data
    * rewrite, no scan; the 100 TB path for TTL on a date-partitioned
    * fact table. Returns the number of partitions dropped.
    */
  def expirePartitions(spark: SparkSession, table: String, partCol: String, cutoff: String): Int = {
    val parts = spark.sql(s"SHOW PARTITIONS $table").collect().map(_.getString(0))
    val expired = parts.flatMap { spec =>
      // spec: "col=value" (single partition column layout)
      spec.split('=') match {
        case Array(c, v) if c == partCol && v < cutoff => Some(v)
        case _ => None
      }
    }
    expired.foreach { v =>
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION ($partCol='$v')")
    }
    expired.length
  }

  /** JDBC sink for Postgres/Power-BI parity (S2/S3 over the wire —
    * the reference's actual sink, check_and_create_db_v4.py:151,295).
    * No Postgres server ships in this environment, but the full call
    * path — Spark's JDBC relation, dialect type mapping, append AND
    * replace SaveModes — is round-trip tested against an embedded
    * Derby database (TablesSpec); only the Postgres dialect itself is
    * unexercised here.
    */
  def writeJdbc(df: DataFrame, url: String, table: String, props: java.util.Properties, mode: SaveMode): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Schema-compatibility diff between a producer's new schema and
    * the consumer's expected one — the data-contract check a publish
    * gate runs BEFORE a write breaks downstream readers. Pure
    * metadata (no scan): one row per difference, kind ∈ added /
    * removed / type_changed / nullability_relaxed (contract requires non-null,
    * producer delivers nullable — the breaking direction; tightening is
    * compatible).
    * Output: (col_name, kind, expected, actual) — empty ⇒ compatible.
    */
  def schemaDiff(expected: StructType, actual: StructType): Seq[(String, String, String, String)] = {
    val e = expected.fields.map(f => f.name -> f).toMap
    val a = actual.fields.map(f => f.name -> f).toMap
    val added = actual.fields.collect {
      case f if !e.contains(f.name) => (f.name, "added", "", f.dataType.simpleString)
    }
    val removed = expected.fields.collect {
      case f if !a.contains(f.name) => (f.name, "removed", f.dataType.simpleString, "")
    }
    val changed = expected.fields.flatMap { f =>
      a.get(f.name).toSeq.flatMap { g =>
        val ty =
          if (f.dataType != g.dataType)
            Seq((f.name, "type_changed", f.dataType.simpleString, g.dataType.simpleString))
          else Seq.empty
        val nl =
          if (f.nullable && !g.nullable) Seq.empty // producer tightened: compatible
          else if (!f.nullable && g.nullable)
            Seq((f.name, "nullability_relaxed", "required", "nullable"))
          else Seq.empty
        ty ++ nl
      }
    }
    (added ++ removed ++ changed).sortBy(r => (r._1, r._2)).toSeq
  }

  /** Bootstrap the CityBike warehouse into the session catalog as
    * managed parquet tables (D2+D3+S3) — the engine-native equivalent
    * of check_and_create_db_v4.py's psycopg2 DDL + to_sql dance.
    */
  def bootstrapCityBike(spark: SparkSession, wh: graft.etl.CityBike.Warehouse, db: String = "citybike"): Unit = {
    createDatabase(spark, db)
    overwriteTable(wh.memberDim, s"$db.member_dimension")
    overwriteTable(wh.rideableDim, s"$db.rideable_dimension")
    overwriteTable(wh.stationDim, s"$db.station_dimension")
    overwriteTable(wh.dateDim, s"$db.date_dimension")
    overwriteTable(wh.fact, s"$db.ride_fact")
  }
}
