package graft

import org.scalatest.funsuite.AnyFunSuite

/** The degraded-retry policy (VERDICT r9 #3) as executable semantics:
  * BENCH_r09 shipped a degraded:true wall because the bench measured
  * through a starved window and stopped; these pin the rules the
  * round-10 bench follows instead. Pure-JVM (the policy functions are
  * extracted from the run loop precisely so this spec exists). */
class BenchRetrySpec extends AnyFunSuite {

  test("the configured passes always run, healthy or not") {
    assert(Bench.needAnotherPass(0, 3, Seq(), 0, 3))
    assert(Bench.needAnotherPass(2, 3, Seq(false, false), 0, 3))
    // third configured pass still due even though the first two were clean
    assert(Bench.needAnotherPass(2, 3, Seq(false, true), 0, 3))
  }

  test("all-degraded budget exhausted -> retry, until one healthy pass lands") {
    // 3 configured passes all degraded: retries are granted
    assert(Bench.needAnotherPass(3, 3, Seq(true, true, true), 0, 3))
    assert(Bench.needAnotherPass(4, 3, Seq(true, true, true, true), 1, 3))
    // a healthy pass (even as a retry) ends the retrying immediately
    assert(!Bench.needAnotherPass(4, 3, Seq(true, true, true, false), 1, 3))
    // retries bounded: after maxRetries all-degraded, stop
    assert(!Bench.needAnotherPass(6, 3, Seq.fill(6)(true), 3, 3))
  }

  test("any healthy configured pass means no retries at all") {
    assert(!Bench.needAnotherPass(3, 3, Seq(true, false, true), 0, 3))
  }

  test("wall = min over non-degraded passes when any exists") {
    // the degraded pass has the smallest wall (a starved-start pass
    // can still run fast if contention lifts mid-pass) — it must NOT
    // win the min
    assert(Bench.pickWall(Seq(10.0, 20.0, 30.0), Seq(true, false, false))
      == ((20.0, false)))
    assert(Bench.pickWall(Seq(12.5, 11.0), Seq(false, false)) == ((11.0, false)))
  }

  test("all passes degraded -> min of everything, flagged degraded") {
    assert(Bench.pickWall(Seq(40.0, 35.0, 50.0), Seq(true, true, true))
      == ((35.0, true)))
  }
}
