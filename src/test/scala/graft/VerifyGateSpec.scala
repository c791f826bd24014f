package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Verify job-count regression gate (VERDICT r15 #2): a wave
  * regression must trip at build time against the committed
  * verify_counters.json baseline, inside the AQE-jitter tolerance it must
  * stay quiet, and entries with no committed value (new this round) pass.
  */
class VerifyGateSpec extends AnyFunSuite {

  test("gate trips over tolerance and resets at/below it") {
    val base = Map("a" -> 5L, "b" -> 10L)
    // exactly baseline + tolerance → quiet
    assert(Verify.jobRegressions(base,
      Seq("a" -> (5L + Verify.JobsTolerance),
        "b" -> (10L + Verify.JobsTolerance))).isEmpty)
    // one over → trips, naming the offender with both numbers
    val r = Verify.jobRegressions(base,
      Seq("a" -> (5L + Verify.JobsTolerance + 1), "b" -> 10L))
    assert(r.size == 1 && r.head.startsWith("a: ") &&
      r.head.contains("vs committed 5"))
    // a cured entry (fewer jobs) and a brand-new entry both pass
    assert(Verify.jobRegressions(base,
      Seq("a" -> 2L, "new_entry" -> 100L)).isEmpty)
  }

  test("baseline parser reads the machine-written counter map") {
    val json = """{"a":{"jobs":5,"stages":5,"shuffle_bytes":12,"task_ms":3},""" +
      """"q1_agg":{"jobs":28,"stages":30,"shuffle_bytes":0,"task_ms":0}}"""
    assert(Verify.parseJobsBaseline(json) ==
      Map("a" -> 5L, "q1_agg" -> 28L))
    // a missing or corrupt file parses to empty — the gate then passes
    // everything (no committed baseline, nothing to regress against)
    assert(Verify.parseJobsBaseline("not json").isEmpty)
  }
}
