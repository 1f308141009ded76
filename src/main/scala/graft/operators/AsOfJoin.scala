package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the payload of the
  * latest right row with the same key and `rightTs <= leftTs` —
  * time-series enrichment Spark has no native operator for.
  *
  * Realized with existing operators (SURVEY §4.3 preference (a)):
  * union the tagged sides, one shuffle on the key, one sort by
  * (ts, side), and a running `last(_, ignoreNulls)` carries the most
  * recent right payload forward into each left row. That is the
  * merge-join formulation: no range-condition pair explosion, state is
  * a single row per key during the sort — at 100 TB it scales exactly
  * like any sort-merge join on the key. Right rows sort before left
  * rows at equal timestamps, giving `<=` (inclusive) semantics.
  *
  * All payload columns ride in ONE struct whose presence (not the
  * payload values) drives the `ignoreNulls` carry: a matched right row
  * whose payload value is genuinely NULL yields NULL (DuckDB ASOF
  * semantics), never an older row's value.
  *
  * The right side must be unique per (key, ts) — pre-dedup it
  * (deterministically) or ties make "latest" ambiguous.
  */
object AsOfJoin {

  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String],
      suffix: String = "_asof"): DataFrame = {

    val internal = Seq("__ts", "__side", "__payload", "__match")
    val colliding = payloadCols.filter(left.columns.contains)
    require(
      colliding.isEmpty,
      s"joinAsOf: left side already contains payload column(s) ${colliding.mkString(", ")} — " +
        "rename them before joining, or they would be overwritten in the output")
    require(
      !payloadCols.contains("__rts"),
      "joinAsOf: '__rts' is reserved for the matched right timestamp")
    val reservedHits = (left.columns ++ right.columns).filter(internal.contains)
    require(
      reservedHits.isEmpty,
      s"joinAsOf: column(s) ${reservedHits.distinct.mkString(", ")} collide with internal names " +
        s"(${internal.mkString(", ")}) — rename them before joining")
    val outHits = (payloadCols :+ rightTs).map(_ + suffix).filter(left.columns.contains)
    require(
      outHits.isEmpty,
      s"joinAsOf: output column(s) ${outHits.mkString(", ")} already exist on the left side")

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // A NULL right timestamp satisfies no `rightTs <= leftTs` predicate
    // (UNKNOWN in SQL) — drop such rows, or the nulls-first sort would
    // make one the carried match for every left row. Same for NULL keys:
    // ASOF equality never matches NULL = NULL, but Window.partitionBy
    // groups NULL keys into one partition and would carry a NULL-keyed
    // right row into NULL-keyed left rows.
    val r = right
      .filter(col(rightTs).isNotNull && col(key).isNotNull)
      .select(
        col(key),
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(col(rightTs).as("__rts") +: payloadCols.map(col): _*).as("__payload"))

    // Left rows carry a NULL struct, so last(ignoreNulls) below keys the
    // carry on right-row PRESENCE; individual payload fields stay NULL
    // if the matched row's were.
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outCols =
      left.columns.toSeq.map(col) ++
        payloadCols.map(p => col("__match").getField(p).as(p + suffix)) :+
        col("__match").getField("__rts").as(rightTs + suffix)
    matched.select(outCols: _*)
  }

  /** Nearest-event join: attach the right row with the same key whose
    * timestamp is CLOSEST to the left row's, in either direction —
    * sensor alignment, nearest-quote enrichment. Composed from two
    * as-of passes (backward, then forward over negated microsecond
    * timestamps — the same merge-join machinery, still two key-sorted
    * shuffles, no range explosion); equal distances break BACKWARD.
    * Output: left columns + `<payload>_near`, `<rightTs>_near`, and
    * `near_dir` ∈ {"bwd", "fwd", null}.
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    require(!left.columns.contains("__lneg") && !right.columns.contains("__rneg"),
      "joinNearest: '__lneg'/'__rneg' are reserved")
    // output-name collisions fail loudly (the joinAsOf suffix-require
    // convention): a left column already named <payload>_near /
    // <rightTs>_near / near_dir would silently duplicate in the result
    // and break every downstream col() with AMBIGUOUS_REFERENCE
    val reserved = payloadCols.map(_ + "_near") ++ Seq(rightTs + "_near", "near_dir")
    val clash = left.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"joinNearest: left already carries output column(s) ${clash.mkString(", ")}")
    val bwd = joinAsOf(left, right, key, leftTs, rightTs, payloadCols, "_bwd")
    // forward pass: last right with -rts <= -lts ⇔ first right with
    // rts >= lts; joinAsOf orders by the column generically, so
    // negated longs work unchanged
    val fwd = joinAsOf(
      bwd.withColumn("__lneg", -unix_micros(col(leftTs))),
      right.filter(col(rightTs).isNotNull)
        .withColumn("__rneg", -unix_micros(col(rightTs)))
        .drop(rightTs),
      key, "__lneg", "__rneg", payloadCols, "_fwd")
    val gapB = unix_micros(col(leftTs)) - unix_micros(col(rightTs + "_bwd"))
    val gapF = (-col("__rneg_fwd")) - unix_micros(col(leftTs))
    // ties and single-sided matches: backward wins when present and
    // no strictly closer forward match exists
    val useBwd = col(rightTs + "_bwd").isNotNull &&
      (col("__rneg_fwd").isNull || gapB <= gapF)
    val outCols =
      left.columns.toSeq.map(col) ++
        payloadCols.map(p =>
          when(useBwd, col(p + "_bwd")).otherwise(col(p + "_fwd")).as(p + "_near")) ++ Seq(
          when(useBwd, col(rightTs + "_bwd"))
            .otherwise(timestamp_micros(-col("__rneg_fwd"))).as(rightTs + "_near"),
          when(useBwd, lit("bwd"))
            .when(col("__rneg_fwd").isNotNull, lit("fwd"))
            .otherwise(lit(null).cast("string")).as("near_dir"))
    fwd.select(outCols: _*)
  }
}
