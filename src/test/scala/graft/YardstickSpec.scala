package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the parallelism gating of the interval-anchor reference
  * (no SparkSession needed — the gate is pure arithmetic over the
  * calibration constants; the probe itself is exercised by every
  * Bench/ScaleProbe run).
  */
class YardstickSpec extends AnyFunSuite {

  test("yardstickRefFor: calibrated ref only at the calibration thread count") {
    // These assertions assume SPARK_GRAFT_YARDSTICK_REF is unset in the
    // test environment (the env override bypasses the gate by design).
    assume(sys.env.get("SPARK_GRAFT_YARDSTICK_REF").isEmpty)
    assert(Bench.yardstickRefFor(Bench.YardstickCalibCpus) == Bench.YardstickRefSec)
    // any other thread count disables level adjudication: the probe is
    // fixed work, so a local[4] run would read ~6-8x the local[32] ref
    // and re-run every pass as "level-drifted" (the r11 ADVICE finding)
    assert(Bench.yardstickRefFor(4) == -1.0)
    assert(Bench.yardstickRefFor(64) == -1.0)
    assert(Bench.yardstickRefFor(-1) == -1.0) // unparseable cpus env
  }
}
