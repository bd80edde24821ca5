package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Long-document canary: every corpus-scale per-document operator runs
  * over 200k-token documents — the book/concatenation regime real
  * pretraining corpora contain and the sf* fixtures (≈500-token docs)
  * never exercise.
  *
  * Round 10 found two O(len^2)-per-document defects this battery would
  * have caught as hangs (a 200k-token document took >500 s through the
  * old shingle path, 3 s through the fixed one): tokenization
  * re-evaluated per gram inside a transform lambda, and List indexing
  * in the ExactSubstr rebuild kernel. Each case asserts a cheap
  * structural invariant; the REAL assertion is that the suite
  * completes at all — any reintroduced length-quadratic path turns
  * one of these cases into a multi-hour hang.
  */
class LongDocSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nTok = 200000
  // two long docs sharing one 8-token run (so the dedup family has
  // signal), plus a short doc (empty-edge coverage)
  private lazy val docs = {
    val run = (0 until 8).map(k => s"shared$k").mkString(" ")
    val d1 = (0 until nTok).map(k => s"a$k").mkString(" ") + " " + run
    val d2 = run + " " + (0 until nTok).map(k => s"b$k").mkString(" ")
    Seq((1L, d1, "web"), (2L, d2, "book"), (3L, "tiny doc", "web"))
      .toDF("doc_id", "text", "source").persist()
  }

  test("shingle/gram family is token-linear on 200k-token documents") {
    val sh = TextOps.shingleTable(docs, n = 8)
    assert(sh.count() > 2L * (nTok - 8))
    val spans = CorpusOps.dupSubstringSpans(docs, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSet == Set((1L, nTok + 1L, nTok + 8L), (2L, 1L, 8L)),
      s"unexpected spans: ${spans.mkString(",")}")
    val rw = CorpusOps.dupSubstringRewrite(docs, n = 8)
      .select(col("doc_id"), col("n_removed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // keeper = lexicographically first occurrence (doc 1 end-run)
    assert(rw(1L) == 0L && rw(2L) == 8L, s"rewrite cut wrong spans: $rw")
  }

  test("counting/scoring family is token-linear on 200k-token documents") {
    assert(TextOps.bigramPmi(docs, minCount = 1, topK = 5).count() == 5)
    val nc = TextOps.noveltyCurve(docs, n = 3, bucketSize = 2)
    assert(nc.count() >= 1)
    assert(TextOps.sourceOverlapMatrix(docs, n = 3).count() == 1)
    assert(TextOps.hllShingleRegisters(docs, n = 3).count() <= 2 * 256)
    val rep = TextOps.repetitionFeatures(docs).filter(col("doc_id") === 1L)
      .select(col("n_grams3")).head().getLong(0)
    assert(rep == nTok + 8 - 2)
    assert(TextOps.fingerprints(docs).count() == 3)
  }

  test("tokenizer encoders are char-linear on a 200k-char single-word document") {
    // ONE pathological 200k-char word: the per-distinct-word loops
    // (bpeLearn's rewrite + trigram scan, greedyPieceCount's backoff
    // walk) must stay linear-ish in word length — the same defect
    // class as round 10's per-gram re-tokenization, which this case
    // would turn into a hang
    val giant = "ab" * 100000
    val tdocs = Seq((1L, giant), (2L, "ab ab cd")).toDF("doc_id", "text")
    // merges: (a,b) -> (ab,ab) -> (abab,abab) -> (abababab, abababab);
    // giant collapses 200k chars -> 12500 len-16 symbols
    val bpe = TextOps.bpeEncode(tdocs, merges = 4, batch = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(bpe == Seq((1L, 1L, 12500L), (2L, 3L, 4L)), s"got $bpe")
    // greedy longest-match over the same pieces: len-16 piece matches
    // end to end, 0 UNK
    val wp = TextOps.wordpieceEncode(tdocs, merges = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(wp == Seq((1L, 12500L, 0L), (2L, 4L, 0L)), s"got $wp")
  }

  test("unigram training is distinct-word-linear when EVERY word is distinct") {
    // the 200k-token docs have ~400k DISTINCT words — the worst case
    // for a vocabulary-compressed tokenizer (compression buys nothing,
    // the substring seed explodes every word). Seeding, the EM round,
    // and encoding must all stay token-linear; a length-quadratic or
    // vocab-quadratic path turns this into a hang
    val enc = UnigramOps.unigramEncode(docs, maxPieceLen = 4,
        seedMulti = 32, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(enc.map(_._1) == Seq(1L, 2L, 3L))
    assert(enc.head._2 == nTok + 8L, s"doc-1 word count: ${enc.head}")
    // the per-word DP bounds word length loudly: a single word past
    // the packed-composite capacity must fail with the guard, never
    // silently truncate or wrap
    val giantWord = Seq((1L, "x" * 4096)).toDF("doc_id", "text")
    val e = intercept[org.apache.spark.SparkException] {
      UnigramOps.unigramEncode(giantWord, maxPieceLen = 2,
        seedMulti = 2, iters = 0).collect()
    }
    assert(e.getMessage.contains("2047") || Option(e.getCause)
      .exists(_.getMessage.contains("2047")), s"guard not loud: ${e.getMessage}")
  }

  test("chunk/window family is token-linear on 200k-token documents") {
    val w = TextOps.contextWindows(docs, size = 64, stride = 48)
    assert(w.filter(col("doc_id") === 1L).count() >= (nTok / 48).toLong)
    val cd = TextOps.chunkDupStats(docs, k = 32)
    assert(cd.count() == 3)
    val cont = CorpusOps.contamination(
      docs, Seq((100L, (0 until 40).map(k => s"a$k").mkString(" "))).toDF("doc_id", "text"),
      n = 8)
    val hit = cont.filter(col("doc_id") === 1L).select(col("n_hits")).head().getLong(0)
    assert(hit == 33L, s"expected 33 contaminated grams, got $hit") // 40 - 8 + 1
  }
}
