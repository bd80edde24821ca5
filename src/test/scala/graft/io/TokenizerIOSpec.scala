package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.text.TextOps

/** [[TokenizerIO]] — the shipped-tokenizer roundtrip: stored merges
  * equal the training output, stored-vocab encoding of the training
  * corpus equals live [[TextOps.bpeEncode]], and a NEW corpus encodes
  * with greedy fallback ([UNK] where greedy sticks) without re-running
  * the merge loop.
  */
class TokenizerIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("tokenizer artifact round-trips; stored encoding matches live bpeEncode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    val train = docsOf("abab ab cd", "ab")
    TokenizerIO.writeTokenizer(train, merges = 2, dir)
    // merges table identical to live training
    val storedMerges = TokenizerIO.readMerges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val liveMerges = TextOps.bpeTrain(train, merges = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(storedMerges == liveMerges && storedMerges.nonEmpty)
    // sidecar exists and pins the merge count
    val side = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/tokenizer.json"))
    assert(side.contains("\"merges\": 2"))
    // stored-vocab encoding of the training corpus == live bpeEncode
    // (every word known -> 0 OOV, 0 UNK)
    val stored = TokenizerIO.encodeStored(spark, dir, train)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1).toSeq
    val live = TextOps.bpeEncode(train, merges = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(stored.map(t => (t._1, t._2, t._3, t._6)) == live)
    assert(stored.forall(t => t._4 == 0L && t._5 == 0L), s"no OOV/UNK on training corpus: $stored")
  }

  test("stored tokenizer encodes an unseen corpus by greedy fallback, [UNK] when stuck") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tok2").toString
    // same construction as the BpeTrainSpec stuck case: pieces {ab, cd, abc}
    TokenizerIO.writeTokenizer(docsOf("abcd ab ab cd cd abc"), merges = 3, dir)
    assert(TokenizerIO.readPieces(spark, dir).toSeq == Seq("ab", "abc", "cd"))
    // new corpus: "abcd" is KNOWN (exact [ab,cd] = 2); "cdab" is OOV but
    // greedy-covered ([cd][ab] = 2); "abca" is OOV and greedy-stuck
    // ("abc" then no piece for "a") -> one [UNK]
    val out = TokenizerIO.encodeStored(spark, dir, docsOf("abcd cdab abca"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(out == Seq((0L, 3L, 5L, 2L, 1L, 1.666667)), s"got $out")
  }

  test("reads validate the sidecar: absent, foreign-format, and truncated all fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tok3").toString
    TokenizerIO.writeTokenizer(docsOf("abab ab"), merges = 2, dir)
    assert(TokenizerIO.storedMergeCount(dir) == 2)
    val side = java.nio.file.Paths.get(s"$dir/tokenizer.json")
    // a future-format artifact must not be consumed silently
    java.nio.file.Files.writeString(side, """{"format": 2, "merges": 2}""")
    val e1 = intercept[IllegalArgumentException](TokenizerIO.readMerges(spark, dir))
    assert(e1.getMessage.contains("format"))
    // a truncated sidecar (interrupted write) must not be consumed
    java.nio.file.Files.writeString(side, """{"format": 1""")
    val e2 = intercept[IllegalArgumentException](TokenizerIO.readVocab(spark, dir))
    assert(e2.getMessage.contains("merges"))
    // a parquet directory that never was a tokenizer artifact
    java.nio.file.Files.delete(side)
    val e3 = intercept[IllegalArgumentException](TokenizerIO.readPieces(spark, dir))
    assert(e3.getMessage.contains("sidecar"))
  }

  test("unigram artifact round-trips; stored encoding matches live unigramEncode") {
    import graft.text.UnigramOps
    val dir = java.nio.file.Files.createTempDirectory("graft-ug-io").toString
    val train = docsOf("abab ab cd", "ab cd cd")
    TokenizerIO.writeUnigram(train, dir, maxPieceLen = 3, seedMulti = 4, iters = 2)
    // stored piece table identical to live training
    val stored = TokenizerIO.readUnigramPieces(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val live = UnigramOps.unigramTrain(train, maxPieceLen = 3, seedMulti = 4, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(stored == live && stored.nonEmpty)
    assert(TokenizerIO.storedUnigramMaxLen(dir) == 3)
    // stored encoding of the training corpus == live encode, 0 UNK
    val enc = TokenizerIO.encodeStoredUnigram(spark, dir, train)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1).toSeq
    val liveEnc = UnigramOps.unigramEncode(train, maxPieceLen = 3, seedMulti = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(enc.map(t => (t._1, t._2, t._3, t._5, t._6)) == liveEnc)
    assert(enc.forall(_._4 == 0L), s"no UNK on the training corpus: $enc")
  }

  test("stored unigram encodes unseen words; unknown characters count [UNK]") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ug-io2").toString
    TokenizerIO.writeUnigram(docsOf("abab ab ab b"), dir,
      maxPieceLen = 2, seedMulti = 2, iters = 1)
    // "ba" is unseen but alphabet-covered (DP segments it);
    // "abx" holds 'x' outside the stored alphabet -> 1 [UNK] at cost 0
    val out = TokenizerIO.encodeStoredUnigram(spark, dir, docsOf("ba abx ab"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out.length == 1)
    val (_, nWords, nTok, nUnk, _) = out.head
    assert(nWords == 3L && nUnk == 1L, s"got $out")
    assert(nTok >= 3L, s"got $out") // ba >= 1, abx = 1 (UNK), ab >= 1
    // sidecar validation stays loud
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/unigram.json"), """{"format": 9}""")
    val e = intercept[IllegalArgumentException](
      TokenizerIO.readUnigramPieces(spark, dir))
    assert(e.getMessage.contains("format"))
  }
}
