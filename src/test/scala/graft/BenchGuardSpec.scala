package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's load-taint contract (VERDICT r6 item 1): a record
  * whose start load violates the repo's load<3 methodology must carry
  * `"tainted": true` so it can't be read as a real regression. BENCH_r06
  * went on record at start load 8.1 and misstated the engine by 1.5× —
  * this pins the rule the guard enforces.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("the load rule is start < 3: boundary and representative values") {
    assert(!Bench.isTainted(0.0))
    assert(!Bench.isTainted(0.73)) // the r6 judge's clean re-run start
    assert(!Bench.isTainted(2.99))
    assert(Bench.isTainted(3.0), ">= at the boundary: the rule is strictly-less-than")
    assert(Bench.isTainted(8.13)) // the committed BENCH_r06 start load
  }

  test("MaxStartLoad is the documented methodology bound") {
    assert(Bench.MaxStartLoad === 3.0)
  }
}
