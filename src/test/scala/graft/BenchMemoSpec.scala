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
    // per-query MEDIAN across lines: a representative quiet reference,
    // not the noise floor (MIN tripped the retry margin on 60+ queries)
    val q1 = memo("q_tpch_q1")
    assert(q1 > 0.0 && q1 < 5.0, s"q_tpch_q1 floor implausible: $q1")
  }

  test("trendMemo of an unknown sf dir is empty (no retry, no crash)") {
    assert(Bench.trendMemo("/no/such/dir").isEmpty)
  }

  test("trendMemo drops -1.0 failure sentinels instead of letting them poison the median") {
    // a query that failed in MOST past lines must either get a median
    // from its surviving positive samples or vanish from the memo —
    // a negative reference makes the loudness check permanently true
    val tmp = java.io.File.createTempFile("trend", ".jsonl")
    tmp.deleteOnExit()
    val w = new java.io.PrintWriter(tmp)
    try {
      w.println("""{"ts":"t1","total":1.0,"sf":"/x/sf0.1","queries":{"q_ok":0.50,"q_flaky":-1.0,"q_dead":-1.0}}""")
      w.println("""{"ts":"t2","total":1.0,"sf":"/x/sf0.1","queries":{"q_ok":0.52,"q_flaky":-1.0,"q_dead":-1.0}}""")
      w.println("""{"ts":"t3","total":1.0,"sf":"/x/sf0.1","queries":{"q_ok":0.54,"q_flaky":0.30,"q_dead":-1.0}}""")
    } finally w.close()
    val memo = Bench.trendMemo("/x/sf0.1", path = tmp.getAbsolutePath)
    assert(memo("q_ok") == 0.52)
    assert(memo("q_flaky") == 0.30, "surviving positive sample should be the reference")
    assert(!memo.contains("q_dead"), "all-sentinel query must vanish, not go negative")
    assert(memo.values.forall(_ > 0))
  }

  test("calibAnchorMt: fastest historical probe wins; current capture can set a new anchor") {
    val tmp = java.io.File.createTempFile("trend", ".jsonl")
    tmp.deleteOnExit()
    val w = new java.io.PrintWriter(tmp)
    try {
      w.println("""{"ts":"t1","total":1.0,"calib_st_ms":846,"calib_mt_ms":953,"sf":"/x/sf0.1","queries":{}}""")
      w.println("""{"ts":"t2","total":1.4,"calib_st_ms":895,"calib_mt_ms":1351,"sf":"/x/sf0.1","queries":{}}""")
    } finally w.close()
    // loud current capture: history's 953 is the anchor → adjusted
    // total scales DOWN by 953/1351
    assert(Bench.calibAnchorMt(1351, path = tmp.getAbsolutePath) == 953L)
    // a new quietest window becomes its own anchor
    assert(Bench.calibAnchorMt(910, path = tmp.getAbsolutePath) == 910L)
    // no history: the current probe anchors itself (adjusted == raw)
    assert(Bench.calibAnchorMt(1000, path = "/no/such/trend.jsonl") == 1000L)
    // zero/garbage probes never produce a zero anchor
    assert(Bench.calibAnchorMt(0, path = "/no/such/trend.jsonl") == 0L)
  }

  test("trendMemo excludes known-loud capture lines when enough quiet lines remain") {
    // r15: three 2.0-4.1x loud-window lines entered the memo and
    // skewed every per-query reference upward — a known-loud line
    // (loudness_index > 1.5) must not shape the quiet reference
    val tmp = java.io.File.createTempFile("trend", ".jsonl")
    tmp.deleteOnExit()
    val w = new java.io.PrintWriter(tmp)
    try {
      w.println("""{"ts":"t1","total":1.0,"sf":"/x/sf0.1","queries":{"q_a":0.50}}""")
      w.println("""{"ts":"t2","total":1.0,"loudness_index":1.1,"sf":"/x/sf0.1","queries":{"q_a":0.54}}""")
      w.println("""{"ts":"t3","total":4.0,"loudness_index":4.1,"sf":"/x/sf0.1","queries":{"q_a":2.10}}""")
      w.println("""{"ts":"t4","total":4.0,"loudness_index":2.2,"sf":"/x/sf0.1","queries":{"q_a":1.90}}""")
    } finally w.close()
    val memo = Bench.trendMemo("/x/sf0.1", path = tmp.getAbsolutePath)
    // median over the two quiet lines only (no-field = quiet, 1.1 = quiet)
    assert(memo("q_a") == 0.54, s"loud lines leaked into the memo: ${memo("q_a")}")
    // but with under 2 quiet lines, loud lines are kept: memo > none
    val tmp2 = java.io.File.createTempFile("trend", ".jsonl")
    tmp2.deleteOnExit()
    val w2 = new java.io.PrintWriter(tmp2)
    try {
      w2.println("""{"ts":"t1","total":4.0,"loudness_index":4.1,"sf":"/x/sf0.1","queries":{"q_a":2.10}}""")
      w2.println("""{"ts":"t2","total":4.0,"loudness_index":2.2,"sf":"/x/sf0.1","queries":{"q_a":1.90}}""")
    } finally w2.close()
    val memo2 = Bench.trendMemo("/x/sf0.1", path = tmp2.getAbsolutePath)
    assert(memo2.contains("q_a"), "all-loud history must still yield a memo")
  }
}
