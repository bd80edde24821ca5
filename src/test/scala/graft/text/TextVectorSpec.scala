package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.vector.VectorOps
import graft.multimodal.Multimodal

class TextVectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docsDf = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "the quick brown fox leaps over the lazy dog"),   // near dup
    (3L, "completely different words entirely unrelated text"),
    (4L, "the quick brown fox jumps over a lazy dog")      // near dup
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = TextOps.exactDedup(docsDf).collect()
    assert(out.length == 4) // docs 0/1 collapse
    val dup = out.find(_.getAs[Long]("n_dups") == 2L).get
    assert(dup.getAs[Long]("doc_id") == 0L)
  }

  test("jaccard pairs find near dups with exact similarity") {
    val pairs = TextOps.jaccardPairs(docsDf, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    // identical docs: jaccard 1.0
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    // near dup 0-2: 8 shared of 9 distinct union... tokens(0)=8 distinct,
    // tokens(2)=8 distinct, shared 7 (jumps vs leaps) -> 7/9
    val p02 = pairs.find(p => p._1 == 0L && p._2 == 2L).get
    assert(math.abs(p02._3 - 7.0 / 9.0) < 1e-6)
    // unrelated doc 3 pairs with nothing
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH candidates are a subset of exact pairs and catch identical docs") {
    val got = TextOps.minhashLshPairs(docsDf, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextOps.jaccardPairs(docsDf, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
    assert(got.contains((0L, 1L))) // identical docs always collide
  }

  test("simhash: identical docs equal, near dups close, unrelated far") {
    val sig = TextOps.simhash(docsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(sig(0L) == sig(1L))
    assert(hamming(sig(0L), sig(2L)) < hamming(sig(0L), sig(3L)))
  }

  test("brute-force cosine top-k is exact and ANN recall is sane") {
    val vecs = (0 until 50).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i * 0.7 + d))
      (i.toLong, base.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val exact = VectorOps.bruteForceTopK(vecs, vecs.filter($"vec_id" < 5), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 15)
    val ann = VectorOps.annTopK(vecs, numPlanes = 4, dims = 8, k = 3)
      .filter($"query_id" < 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall > 0.3, s"ANN recall too low: $recall")
  }

  test("multimodal feature extraction is deterministic over binary payloads") {
    val media = Multimodal.mediaFromDocuments(docsDf)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.byte_len > 0 && f.width >= 16 && f.height >= 16))
    assert(f1.filter(_.media_type == "image").forall(_.n_frames == 1))
  }

  test("language id is deterministic with stable tie-break") {
    val out = TextOps.languageId(docsDf).collect()
    assert(out.length == 5)
    // doc 3 has zero markers everywhere -> tie broken to first lang asc
    val d3 = out.find(_.getLong(0) == 3L).get
    assert(d3.getString(1) == "de" && d3.getLong(2) == 0L)
  }
}
