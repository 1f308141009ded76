package graft

import org.apache.spark.sql.functions._

import graft.operators.Kmv

class KmvSpec extends SparkSpec {

  test("hash48 matches per-nibble arithmetic") {
    import sqlImplicits._
    val out = Seq("a", "token", "42").toDF("s")
      .select(col("s"), Kmv.hash48(col("s")).as("h"))
      .collect()
    out.foreach { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      assert(r.getLong(1) == java.lang.Long.parseLong(hex, 16))
    }
  }

  test("under-full group reports its exact distinct-hash count") {
    import sqlImplicits._
    val df = Seq(("g", "a"), ("g", "b"), ("g", "b"), ("g", "c")).toDF("grp", "k")
    val r = Kmv.distinctSketch(df, Seq("grp"), "k", k = 16).collect()(0)
    assert(r.getLong(1) == 3L) // n_kept = 3 distinct
    assert(r.getLong(3) == 3L) // est = exact
  }

  test("estimate lands within the 1/sqrt(k) band on 10k distinct keys") {
    import sqlImplicits._
    val df = (1 to 10000).map(i => ("g", s"key_$i")).toDF("grp", "k")
    val k = 256
    val r = Kmv.distinctSketch(df, Seq("grp"), "k", k = k).collect()(0)
    val est = r.getLong(3).toDouble
    // 5 standard errors at 1/sqrt(k-2) ≈ 0.063 → ±31%
    assert(est > 10000 * 0.69 && est < 10000 * 1.31, s"est=$est")
    // kth_hash is the k-th smallest → n_kept == k
    assert(r.getLong(1) == k.toLong)
  }

  test("estimate equals the closed form on the kept k-th minimum") {
    import sqlImplicits._
    val df = (1 to 5000).map(i => ("g", s"v$i")).toDF("grp", "k")
    val r = Kmv.distinctSketch(df, Seq("grp"), "k", k = 64).collect()(0)
    val kth = r.getLong(2)
    assert(r.getLong(3) == (63L * (1L << 48)) / kth)
  }

  test("k bound: 32768 accepted ((k-1)*2^48 stays under 2^63), 32769 rejected") {
    import sqlImplicits._
    val df = Seq(("g", "a")).toDF("grp", "k")
    // k = 32768 is the largest wrap-free k: (k-1)*2^48 = 2^63 - 2^48
    assert((32768L - 1L) * (1L << 48) > 0L)
    Kmv.distinctSketch(df, Seq("grp"), "k", k = 32768).collect()
    // k = 32769 would compute (k-1)*2^48 = 2^63 → negative Long —
    // the old bound (65536) silently produced garbage estimates here
    assertThrows[IllegalArgumentException] {
      Kmv.distinctSketch(df, Seq("grp"), "k", k = 32769)
    }
  }
}
