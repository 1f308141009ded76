package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

class TextTokensSpec extends SparkSpec {

  private val tricky = Seq(
    "plain words here",
    "  leading and trailing  ",
    "tabs\tand\nnewlines\randvtff",
    "", "   ", "one",
    "unicode café naïve 中文 中 文",
    "nbsp is-not-whitespace",   // \s is ASCII-only: NBSP stays inside a token
    "a  b   c    d",
    "emoji 😀 mixed")

  test("native tokenizer matches the split+filter HOF byte-for-byte") {
    import sqlImplicits._
    val df = tricky.toDF("text")
    val hof = filter(split(trim(col("text")), "\\s+"), t => length(t) > lit(0))
    val rows = df.select(
      TextFunctions.tokens(col("text")).as("native"),
      hof.as("reference"))
      .collect()
    rows.zip(tricky).foreach { case (r, input) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch on '$input'")
    }
  }

  test("null text yields null, not an empty array") {
    import sqlImplicits._
    val df = Seq(Some("a b"), None).toDF("text")
    val out = df.select(TextFunctions.tokens(col("text")).as("t")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b"))
    assert(out(1).isNullAt(0))
  }

  test("wordShingles and charShingles agree on NULL input (both propagate)") {
    import sqlImplicits._
    // with ANSI off, size(NULL) = −1 < n routed a null token array
    // into wordShingles' empty-array branch while charShingles
    // propagated NULL — the two dedup units classified the same null
    // document differently (explode consumers never saw it; a direct
    // size()/equality consumer would)
    val df = Seq(Some("a b c"), None).toDF("text")
      .select(
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2).as("w"),
        TextFunctions.charShingles(col("text"), 2).as("c"))
    val out = df.collect()
    assert(out(0).getSeq[String](0) == Seq("a b", "b c"))
    assert(out(0).getSeq[String](1).nonEmpty)
    assert(out(1).isNullAt(0), "null doc → null word shingles, not empty")
    assert(out(1).isNullAt(1))
  }

  test("tokenizer stays inside whole-stage codegen (no fallback)") {
    import sqlImplicits._
    // repartition: a bare local relation would constant-fold the
    // projection away (ConvertToLocalRelation) before it reaches a
    // physical Project.
    val df = tricky.toDF("text").repartition(2)
      .select(TextFunctions.tokens(col("text")).as("t"))
    df.collect() // AQE only inserts WholeStageCodegen into the FINAL plan
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // The project evaluating graft_tokens must carry the codegen star
    // (`*(n) Project`) — the HOF formulation it replaces would forbid
    // that (CodegenFallback → bare Project). String check because AQE
    // query stages don't expose their subtrees to TreeNode.collect.
    val s = plan.toString
    assert(
      s.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_tokens.*"),
      s)
  }

  test("graft_tokens is callable from SQL via the extension registration") {
    graft.plans.WhitespaceTokens.register(spark)
    import sqlImplicits._
    Seq("x y  z").toDF("text").createOrReplaceTempView("tt")
    val out = spark.sql("SELECT graft_tokens(text) AS t FROM tt").collect()
    assert(out(0).getSeq[String](0) == Seq("x", "y", "z"))
  }
}
