package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench re-measure rule in isolation (the run-level behavior — load
  * fields, third-window min — is validated by the injected-load
  * acceptance test recorded in BASELINE.md). */
class BenchRuleSpec extends AnyFunSuite {

  test("sweeps disagreeing >1.4x flag a re-measure") {
    assert(Bench.interferenceSuspect(Seq(0.64, 19.8))) // the r3 artifact
    assert(Bench.interferenceSuspect(Seq(1.0, 1.5)))
    assert(Bench.interferenceSuspect(Seq(3.0, 1.0, 2.9)))
  }

  test("agreeing sweeps, tiny queries, and single sweeps do not") {
    assert(!Bench.interferenceSuspect(Seq(1.0, 1.2)))   // within 1.4x
    assert(!Bench.interferenceSuspect(Seq(1.0, 1.4)))   // boundary: not >
    assert(!Bench.interferenceSuspect(Seq(0.05, 0.19))) // sub-0.2 s noise
    assert(!Bench.interferenceSuspect(Seq(2.0)))        // one sweep only
    assert(!Bench.interferenceSuspect(Nil))
  }
}
