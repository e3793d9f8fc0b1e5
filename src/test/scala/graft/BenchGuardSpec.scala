package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's load-taint contract (VERDICT r6 item 1, whole-run
  * since round 9): a record whose 1-min loadavg violates the repo's
  * load<3 methodology in ANY kept window — start, end, or a surviving
  * measurement — must carry `"tainted": true` so it can't be read as a
  * real regression. BENCH_r06 went on record at start load 8.1,
  * BENCH_r07 at end load 5.0, and BENCH_r08 at end load 4.2, each
  * stamped clean under the start-only guard — this pins the rule the
  * guard enforces.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("the load rule is load < 3: boundary and representative values") {
    assert(!Bench.isTainted(0.0))
    assert(!Bench.isTainted(0.73)) // the r6 judge's clean re-run start
    assert(!Bench.isTainted(2.99))
    assert(Bench.isTainted(3.0), ">= at the boundary: the rule is strictly-less-than")
    assert(Bench.isTainted(8.13)) // the committed BENCH_r06 start load
  }

  test("the whole-run verdict taints on start OR end OR a kept-hot measurement") {
    assert(!Bench.isTainted(2.0, 2.9, false), "clean everywhere: untainted")
    assert(Bench.isTainted(5.0, 2.0, false), "hot start alone taints")
    assert(Bench.isTainted(2.0, 5.0, false),
      "hot end alone taints - the BENCH_r07/r08 failure mode")
    assert(Bench.isTainted(2.0, 2.0, true),
      "a hot measurement surviving retries taints even with clean endpoints")
    assert(Bench.isTainted(3.0, 2.0, false), "start boundary is >= like the single-sample rule")
    assert(Bench.isTainted(2.0, 3.0, false), "end boundary is >= like the single-sample rule")
  }

  test("MaxLoad is the documented methodology bound") {
    assert(Bench.MaxLoad === 3.0)
  }
}
