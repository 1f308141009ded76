package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff (batch CDC): which rows were added, removed, or
  * changed between two snapshots of the same table — the operation a
  * warehouse runs to derive an incremental load from full extracts
  * (the reference re-ingests its full ride CSV per load,
  * /root/reference/src/check_and_create_db_v4.py:139-156; at 100 TB
  * you diff snapshots and apply the delta instead).
  *
  * Scale shape: each side is first reduced to (key, md5-of-values) —
  * a narrow map — so the one wide operation, the full-outer key join,
  * shuffles 32-byte digests instead of full rows. Equality via digest
  * is exact for equal rows and wrong only on an md5 collision
  * (~2⁻¹²⁸); `to_json` keeps NULL distinct from empty/zero values and
  * renders doubles shortest-round-trip, so distinct values cannot
  * alias. Unchanged keys are dropped before any downstream work.
  */
object SnapshotDiff {

  /** Diff snapshots `a` (old) and `b` (new) on `keyCols`; emits one row
    * per differing key: keyCols ++ (change_type ∈ added|removed|changed).
    * Both snapshots must carry the same non-key columns.
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val valueCols = a.columns.filterNot(keyCols.contains).sorted.toSeq
    require(
      b.columns.filterNot(keyCols.contains).sorted.toSeq == valueCols,
      s"snapshot value columns differ: $valueCols vs ${b.columns.filterNot(keyCols.contains).sorted.toSeq}")
    // key columns renamed per side and joined NULL-SAFELY (<=>): the
    // plain USING full-outer treats NULL ≠ NULL, so an UNCHANGED
    // null-keyed row matched nothing on either side and was reported
    // twice — as both 'added' and 'removed' — which a downstream CDC
    // apply would replay as a delete + re-insert of an untouched row.
    // (Distinct per-side names also keep the self-diff case — one
    // table split in two — free of ambiguous-attribute resolution.)
    def digested(df: DataFrame, tag: String) =
      df.select(keyCols.map(c => col(c).as(s"__k${tag}_$c")) :+
        md5(to_json(struct(valueCols.map(col): _*))).as(s"__h$tag"): _*)
    digested(a, "a")
      .join(
        digested(b, "b"),
        keyCols.map(c => col(s"__ka_$c") <=> col(s"__kb_$c")).reduce(_ && _),
        "full_outer")
      .select(keyCols.map(c => coalesce(col(s"__ka_$c"), col(s"__kb_$c")).as(c)) :+
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") =!= col("__hb"), lit("changed"))
          .as("change_type"): _*)
      .filter(col("change_type").isNotNull)
  }
}
