package graft

import org.apache.spark.sql.functions._

import graft.plans.JaroWinkler.jaroWinkler

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double = {
    import sqlImplicits._
    Seq((a, b)).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).head().getDouble(0)
  }

  test("classic published values (Winkler 1990 examples)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-10)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
  }

  test("bounds, identity, symmetry, empties") {
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0) // no matches
    val pairs = Seq(("kitten", "sitting"), ("flaw", "lawn"), ("a", "ab"))
    pairs.foreach { case (a, b) =>
      val x = jw(a, b); val y = jw(b, a)
      assert(x == y, s"asymmetric on ($a, $b)")
      assert(x >= 0.0 && x <= 1.0)
    }
  }

  test("prefix boost caps at 4 and scales by 0.1") {
    // identical 5-prefix, one trailing mismatch: prefix cap must be 4
    val v = jw("abcdex", "abcdey")
    val jaro = (5.0 / 6 + 5.0 / 6 + 5.0 / 5) / 3
    assert(math.abs(v - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  test("SQL face graft_jaro_winkler is registered and codegen-compatible") {
    import sqlImplicits._
    val df = (1 to 200).map(i => (s"token$i", s"tokem$i")).toDF("a", "b")
    df.createOrReplaceTempView("jw_in")
    val rows = spark.sql(
      "SELECT graft_jaro_winkler(a, b) AS s FROM jw_in WHERE graft_jaro_winkler(a, b) > 0.8")
      .collect()
    assert(rows.length == 200 && rows.forall(_.getDouble(0) > 0.8))
  }

  test("null propagation") {
    import sqlImplicits._
    val r = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }
}
