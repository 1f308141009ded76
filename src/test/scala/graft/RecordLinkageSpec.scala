package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.FieldSpec

class RecordLinkageSpec extends SparkSpec {

  private def people(rows: Seq[(Long, String, String, Double)]) = {
    import sqlImplicits._
    rows.toDF("id", "blk", "name", "bal")
  }

  test("planted duplicates score above threshold, distinct records below") {
    val left = people(Seq(
      (1L, "a", "alice", 10.0), (2L, "a", "bob", 20.0), (3L, "b", "carol", 30.0)))
    val right = people(Seq(
      (11L, "a", "alice", 10.0),   // exact dup of 1
      (12L, "a", "robert", 99.0),  // same block as 1/2, nothing agrees
      (13L, "b", "carol", 30.005)) // dup of 3 within balance epsilon
    )
    val fields = Seq(
      FieldSpec("name", col("l_name") === col("r_name"), 0.95, 0.01),
      FieldSpec("bal", abs(col("l_bal") - col("r_bal")) <= 0.01, 0.9, 0.05))
    val got = RecordLinkage.link(left, right, Seq("blk"), fields, thresholdMicro = 0L)
      .select("l_id", "r_id", "score_micro", "is_match")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getBoolean(3)))).toMap
    assert(got((1L, 11L))._2 && got((3L, 13L))._2, got.toString)
    assert(!got((1L, 12L))._2 && !got((2L, 11L))._2 && !got((2L, 12L))._2, got.toString)
    // exact integer score: both fields agree
    val expTop = fields.map(_.wAgreeMicro).sum
    assert(got((1L, 11L))._1 == expTop, got.toString)
    // candidates only form INSIDE blocks: carol never meets the a-block
    assert(!got.contains((3L, 11L)) && !got.contains((1L, 13L)))
  }

  test("weights are the quantized log-likelihood ratios") {
    val f = FieldSpec("x", lit(true), 0.9, 0.05)
    assert(f.wAgreeMicro == math.round(math.log(0.9 / 0.05) * 1e6))
    assert(f.wDisagreeMicro == math.round(math.log(0.1 / 0.95) * 1e6))
    assert(f.wAgreeMicro > 0 && f.wDisagreeMicro < 0)
    intercept[IllegalArgumentException] { FieldSpec("bad", lit(true), 0.5, 0.6) }
  }

  test("a missing field carries NO evidence (weight 0, null bit), not a disagreement charge") {
    import sqlImplicits._
    // Fellegi-Sunter missing-value rule: the old when().otherwise()
    // charged a NULL comparison the full disagree weight, silently
    // dropping true matches with one unobserved field below threshold
    val cand = Seq(
      (1L, Some("alice"), Some("alice")),   // observed agree
      (2L, Some("alice"), Option.empty[String]), // missing -> no evidence
      (3L, Some("alice"), Some("bob")))     // observed disagree
      .toDF("pair_id", "l_name", "r_name")
    val f = FieldSpec("name", col("l_name") === col("r_name"), 0.9, 0.1)
    val out = RecordLinkage.score(cand, Seq(f), thresholdMicro = 0L)
      .collect().map(r => r.getAs[Long]("pair_id") ->
        (Option(r.getAs[java.lang.Integer]("agree_name")), r.getAs[Long]("score_micro"))).toMap
    assert(out(1L) == ((Some(1), f.wAgreeMicro)))
    assert(out(2L) == ((None, 0L)), s"missing field must score 0 with a NULL bit, got ${out(2L)}")
    assert(out(3L) == ((Some(0), f.wDisagreeMicro)))
  }
}
