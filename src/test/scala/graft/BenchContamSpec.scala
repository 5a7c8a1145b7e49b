package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication flag rule (VERDICT r18 item 6): a
  * seeded slowdown against a committed-record min must trip the flag,
  * honest readings and sub-jitter references must not. Pure function —
  * no Spark session. */
class BenchContamSpec extends AnyFunSuite {

  test("seeded slowdown trips the contamination flag; honest runs do not") {
    val ref = Map("q_fast" -> 1.0, "q_slow" -> 2.0, "q_tiny" -> 0.01)
    val results = Seq(
      // honest: min within 3x of committed
      "q_fast" -> Seq(1.2, 1.1, 2.9, 1.3, 1.4),
      // seeded regression/contamination: best of reps still 4x committed
      "q_slow" -> Seq(9.0, 8.5, 8.0, 8.2, 8.1),
      // sub-ContamFloorSec reference: scheduler jitter, never flagged
      "q_tiny" -> Seq(0.5, 0.4, 0.6, 0.5, 0.5),
      // no committed reference at all
      "q_new" -> Seq(10.0, 11.0, 12.0, 10.5, 10.1))
    val flagged = Bench.contamFlags(results, ref)
    assert(flagged.map(_._1) == Seq("q_slow"),
      s"exactly the seeded slowdown must flag: $flagged")
    val (name, mn, rm) = flagged.head
    assert(name == "q_slow" && mn == 8.0 && rm == 2.0)
  }

  test("flag clears when the best rep recovers under the bar") {
    val ref = Map("q" -> 1.0)
    // a transient stall: 4 slow reps but one honest one under 3x
    assert(Bench.contamFlags(Seq("q" -> Seq(9.0, 8.0, 2.9, 8.1, 9.5)),
      ref).isEmpty)
  }
}
