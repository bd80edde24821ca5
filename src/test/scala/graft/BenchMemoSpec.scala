package graft

import org.scalatest.funsuite.AnyFunSuite

/** The loudness-retry memo is what lets Bench tell "this window is
  * hot" from "this code got slower" — if its parser silently returns
  * an empty map, the retry never fires and the r13 loud-final-window
  * defect is back. Pin it against the repo's own trend file and a
  * synthetic line.
  */
class BenchMemoSpec extends AnyFunSuite {

  test("trendMemo parses the repo trend file for the driver's sf dir") {
    val memo = Bench.trendMemo("/root/testdata/sf0.1")
    assert(memo.size > 150, s"memo unexpectedly small: ${memo.size} entries")
    assert(memo.contains("q_tpch_q1"), "headline query missing from memo")
    assert(memo.values.forall(v => v > 0 && v < 120),
      "memo values outside a sane per-query seconds range")
    // per-query MIN across lines: the memo is a noise floor
    val q1 = memo("q_tpch_q1")
    assert(q1 > 0.0 && q1 < 5.0, s"q_tpch_q1 floor implausible: $q1")
  }

  test("trendMemo of an unknown sf dir is empty (no retry, no crash)") {
    assert(Bench.trendMemo("/no/such/dir").isEmpty)
  }
}
