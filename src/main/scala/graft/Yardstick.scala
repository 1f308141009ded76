package graft

import org.apache.spark.sql.SparkSession

/** Standalone yardstick recorder: one fresh JVM, N in-JVM probe
  * samples, one JSON line. `tools/record_yardstick.sh` launches K of
  * these and reports the global minimum — the candidate
  * `Bench.YardstickRefSec` — replacing the prose re-record procedure
  * (the r11 verdict's governance finding: a stale ref should be fixed
  * by a tool, not by hand). Also the interval bracket for solo A/B
  * adjudications: run it immediately before and after the timed JVMs
  * so the sitting carries printed indexes.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Yardstick [nSamples]"
  */
object Yardstick {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Bench.YardstickCalibCpus.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the probe's 64-bit mix deliberately wraps — Spark 4's ANSI
      // default would throw ARITHMETIC_OVERFLOW (Bench sets the same)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val samples = (1 to n).map(_ => Bench.yardstick(spark))
    val ref = Bench.yardstickRefFor(cpus)
    val idx = if (ref > 0) math.round(samples.min / ref * 1000) / 1000.0 else -1.0
    val sJson = samples.map(v => math.round(v * 1000) / 1000.0).mkString("[", ",", "]")
    println(
      s"""{"samples":$sJson,"min":${math.round(samples.min * 1000) / 1000.0},""" +
        s""""cpus":$cpus,"calib_cpus":${Bench.YardstickCalibCpus},"ref":$ref,"index":$idx}""")
    spark.stop()
  }
}
