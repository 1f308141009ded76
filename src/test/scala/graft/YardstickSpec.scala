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

  test("passNeedsRerun: closing-bracket drift fires even when the min is clean") {
    // the r13 run-1 motivating shape: pass STARTS clean, DEGRADES —
    // min sample printed idx 1.17 while the post-pass bracket read
    // 1.89; the old min-only trigger let the contaminated tail stand
    assert(Bench.passNeedsRerun(0, 10, minIdx = 1.17, postIdx = 1.89, levelDrift = 1.25))
    // level drift (uniformly slow sitting): min itself over trigger
    assert(Bench.passNeedsRerun(0, 10, minIdx = 1.4, postIdx = 1.4, levelDrift = 1.25))
    // spike drift is index-independent (rests on 200+ per-query times)
    assert(Bench.passNeedsRerun(12, 10, minIdx = -1.0, postIdx = -1.0, levelDrift = 1.25))
    // clean pass: nothing fires
    assert(!Bench.passNeedsRerun(3, 10, minIdx = 1.15, postIdx = 1.2, levelDrift = 1.25))
    // adjudication off (-1 sentinels) never fires the index triggers
    assert(!Bench.passNeedsRerun(3, 10, minIdx = -1.0, postIdx = -1.0, levelDrift = 1.25))
  }

  test("bandWide: wide pass band gates the top-contributor isolation block") {
    // r13 pass band [1.113, 1.492]: 0.379 index units wide → wide
    assert(Bench.bandWide(Seq(0.857, 1.149), 0.77))
    // a clean narrow band (r11-class ~[1.13, 1.26]) is NOT wide
    assert(!Bench.bandWide(Seq(0.870, 0.970), 0.77))
    // adjudication off / unbracketed → never wide
    assert(!Bench.bandWide(Seq(0.5, 2.0), -1.0))
    assert(!Bench.bandWide(Nil, 0.77))
  }

  test("phaseBandJson: [min,max] index band; -1 sentinel when unadjudicable") {
    // min certifies, max labels within-phase contention — the r13
    // motivating shape: a phase bracketed by one clean and one
    // contended sample must surface BOTH
    assert(Bench.phaseBandJson(Seq(0.77, 1.54), 0.77) == "[1.0,2.0]")
    // rounding to 3 decimals, min/max order independent of sample order
    assert(Bench.phaseBandJson(Seq(1.458, 0.903), 0.77) == "[1.173,1.894]")
    assert(Bench.phaseBandJson(Seq(0.903), 0.77) == "[1.173,1.173]")
    // adjudication off (foreign thread count) or unbracketed phase
    assert(Bench.phaseBandJson(Seq(0.9), -1.0) == "[-1.0,-1.0]")
    assert(Bench.phaseBandJson(Nil, 0.77) == "[-1.0,-1.0]")
  }

  test("membwProbe: the bandwidth axis returns sane, repeatable raw seconds") {
    // the r14 ABBA finding's instrument: a 1 GiB sequential stream
    // pass. No calibrated ref by design (the raw number is the
    // cross-day series), so the contract is shape, not speed: strictly
    // positive, under the 10 s absurdity bound on any machine this
    // engine targets, and two back-to-back samples within 4x of each
    // other (each is already a min-of-3, so only a broken probe —
    // dead-code-eliminated loop reading ~0, or a per-call re-alloc
    // timing the allocator — trips this, not a noisy host)
    val a = Bench.membwProbe()
    val b = Bench.membwProbe()
    assert(a > 0 && b > 0, s"membw samples must be positive: $a, $b")
    assert(a < 10 && b < 10, s"a 1 GiB stream pass cannot take 10 s: $a, $b")
    assert(math.max(a, b) / math.min(a, b) < 4, s"unstable probe: $a vs $b")
  }
}
