package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden correctness signal for [[TextOps.compressionRatio]].
  *
  * The harness records `q_text_compress` as rows-only (`no_oracle`)
  * because DuckDB has no deflate scalar — this spec IS the correctness
  * gate for the operator. JDK `Deflater` at a fixed level is
  * deterministic for a given bundled zlib, and these expected byte
  * counts were produced by this container's JDK 17; if a future JDK
  * swaps zlib versions the lengths (not the semantics) may shift, which
  * is exactly the failure this golden should surface loudly.
  */
class CompressGoldenSpec extends AnyFunSuite {

  test("deflate lengths and ratios are exact for fixed inputs") {
    val spark = TestSpark.spark
    import spark.implicits._

    val docs = Seq(
      (1L, "ab" * 500),                                      // highly repetitive — the filter's target
      (2L, "The quick brown fox jumps over the lazy dog. " +
        "Pack my box with five dozen liquor jugs. " +
        "Sphinx of black quartz, judge my vow."),            // natural prose
      (3L, "café naïve résumé — " +
        "日本語 テスト"),            // short multi-byte UTF-8: deflate EXPANDS it
      (4L, "")                                               // empty: ratio defined as 0.0
    ).toDF("doc_id", "text")

    val got = TextOps.compressionRatio(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

    // (raw utf-8 bytes, deflate-level-6 bytes, round(deflate/raw, 6))
    assert(got(1L) === ((1000L, 18L, 0.018)))
    assert(got(2L) === ((123L, 105L, 0.853659)))
    assert(got(3L) === ((45L, 54L, 1.2)))      // ratio > 1: incompressible short text
    assert(got(4L) === ((0L, 8L, 0.0)))        // 8 bytes = zlib header + empty block + adler32
  }

  test("repetitive text scores far below prose — the filter discriminates") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam " * 200),
      (2L, ("In the beginning of a corpus pipeline the quality signals must be " +
        "cheap, local, and monotone under concatenation of unrelated text. ") +
        ("Different sentences contribute different n-gram statistics and thus " +
        "resist dictionary coding much more than a repeated template does."))
    ).toDF("doc_id", "text")
    val m = TextOps.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) < 0.05, s"repetitive ratio ${m(1L)} should be near zero")
    assert(m(2L) > 0.4, s"prose ratio ${m(2L)} should be substantial")
    assert(m(1L) < m(2L) / 5)
  }
}
