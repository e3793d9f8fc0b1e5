package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's load-taint contract (VERDICT r6 item 1, whole-run
  * since round 9): a record measured against a busy host must carry
  * `"tainted": true` so it can't be read as a real regression. Two
  * signals, matched to what each window can observe:
  *
  *  - START (bench idle): 1-min loadavg < 3 — loadavg measures the
  *    host there. BENCH_r06 went on record at start load 8.1.
  *  - mid-run / END (bench busy): EXTERNAL CPU share < 10% of all
  *    cores — loadavg there measures mostly the bench's own 32-thread
  *    bursts (an empirically clean run ends its 90-query tail at
  *    loadavg ~5), while not-us CPU stays ~0 on a quiet host.
  *    BENCH_r07/r08 were end-hot with real external noise and stamped
  *    clean under the start-only guard.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("the start rule is loadavg < 3: boundary and representative values") {
    assert(!Bench.isTainted(0.0))
    assert(!Bench.isTainted(0.73)) // the r6 judge's clean re-run start
    assert(!Bench.isTainted(2.99))
    assert(Bench.isTainted(3.0), ">= at the boundary: the rule is strictly-less-than")
    assert(Bench.isTainted(8.13)) // the committed BENCH_r06 start load
  }

  test("the window rule is external CPU share < 10%: boundary and representative values") {
    assert(!Bench.isHotWindow(0.0))
    assert(!Bench.isHotWindow(0.02), "log-pumping sbt parent stays under the bound")
    assert(!Bench.isHotWindow(0.099))
    assert(Bench.isHotWindow(0.10), ">= at the boundary")
    assert(Bench.isHotWindow(0.5), "a concurrent verify/driver run is unmistakable")
  }

  test("the whole-run verdict taints on hot start OR hot end OR a kept-hot measurement") {
    assert(!Bench.isTainted(2.0, 0.05, false), "clean everywhere: untainted")
    assert(Bench.isTainted(5.0, 0.0, false), "hot start alone taints")
    assert(Bench.isTainted(2.0, 0.4, false),
      "external CPU in the end window alone taints - the BENCH_r07/r08 failure mode")
    assert(Bench.isTainted(2.0, 0.0, true),
      "a hot measurement surviving retries taints even with clean endpoints")
    assert(Bench.isTainted(3.0, 0.0, false), "start boundary is >= like the single-sample rule")
    assert(Bench.isTainted(2.0, 0.10, false), "end boundary is >= like the window rule")
  }

  test("the documented methodology bounds") {
    assert(Bench.MaxLoad === 3.0)
    assert(Bench.MaxExternalBusy === 0.10)
    assert(Bench.MaxBandRatio === 1.5)
  }

  test("the band rule taints a wide min/max band even when the samplers saw nothing") {
    assert(!Bench.isBandTainted(59.2, 82.4),
      "the r10 judge's clean re-run band (1.39x) stays clean")
    assert(Bench.isBandTainted(112.0, 197.0),
      "the contaminated BENCH_r10 band (1.76x) is tainted - the r10 failure mode")
    assert(!Bench.isBandTainted(10.0, 15.0), "boundary: the rule is strictly-greater-than 1.5")
    assert(Bench.isBandTainted(10.0, 15.01))
    assert(!Bench.isBandTainted(0.0, 100.0),
      "an all-failed run has no meaningful band (failed-count marks it instead)")
    assert(!Bench.isBandTainted(-1.0, 100.0))
  }

  test("the rep-total band rule (r17) rates warm reps, not summed extremes") {
    // 252 queries' independent jitter used to accumulate O(n) into the
    // summed-extremes band (r16: 1.40-1.49 on idle hosts) while actual
    // rep sweeps agreed within a few percent — the rule now reads the
    // real per-rep totals, warm reps only (rep 1 carries per-query plan
    // compile and is high for an honest reason).
    assert(!Bench.isBandTainted(Seq(240.0, 200.0, 205.0), 162.0, 227.6),
      "idle-host shape: wide summed-extremes band, tight warm reps - clean")
    assert(Bench.isBandTainted(Seq(240.0, 130.0, 200.0), 100.0, 101.0),
      "one warm rep sweep 1.54x the other = conditions changed mid-run")
    assert(!Bench.isBandTainted(Seq(300.0, 200.0, 201.0), 100.0, 300.0),
      "rep 1 alone being high never taints (plan-compile cost is honest)")
    assert(!Bench.isBandTainted(Seq(200.0, 100.0, 149.9), 100.0, 100.0))
    assert(Bench.isBandTainted(Seq(200.0, 100.0, 150.1), 100.0, 100.0),
      "boundary: strictly-greater-than 1.5 on warm max/min")
    // fewer than two warm reps: falls back to the legacy min/max rule
    assert(Bench.isBandTainted(Seq(100.0), 112.0, 197.0),
      "reps=1 keeps the legacy rule (the r10 band still taints)")
    assert(!Bench.isBandTainted(Seq(100.0, 110.0), 60.0, 80.0),
      "reps=2 has one warm rep: legacy rule, clean band stays clean")
  }

  test("the 6-arg whole-run verdict composes the sampled rules with the band rule") {
    assert(!Bench.isTainted(2.0, 0.05, false, Seq(70.0, 60.0, 62.0), 60.0, 80.0),
      "clean everywhere: untainted")
    assert(Bench.isTainted(2.79, 0.0, false, Seq(150.0, 110.0, 190.0), 112.0, 197.0),
      "the BENCH_r10 scenario still taints: samplers clean, warm reps disagree 1.7x")
    assert(Bench.isTainted(5.0, 0.0, false, Seq(61.0, 60.0, 61.0), 60.0, 61.0),
      "hot start still taints on its own")
    assert(Bench.isTainted(2.0, 0.4, false, Seq(61.0, 60.0, 61.0), 60.0, 61.0),
      "hot end still taints on its own")
    assert(Bench.isTainted(2.0, 0.0, true, Seq(61.0, 60.0, 61.0), 60.0, 61.0),
      "kept-hot rep still taints on its own")
  }
}
