package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[DedupIndexIO]] — the persisted incremental-dedup state: a stored
  * index probed by a shard must produce EXACTLY the stateless
  * [[graft.text.TextOps.incrementalLshPairs]] output; rolling the
  * index forward must make later shards see earlier shards; and the
  * sidecar must stay loud.
  */
class DedupIndexIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("stored-index probe equals the stateless incremental operator exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix").toString
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val shard = docs.filter(col("doc_id") % 3 === 0)
    DedupIndexIO.writeIndex(base, dir, numHashes = 64, bands = 16)
    assert(DedupIndexIO.storedParams(dir) == ((64, 16)))
    val stored = pairs(DedupIndexIO.probeIndex(spark, dir, shard, threshold = 0.9))
    val stateless = pairs(graft.text.TextOps.incrementalLshPairs(
      base, shard, numHashes = 64, bands = 16, threshold = 0.9))
    assert(stored == stateless && stored.nonEmpty,
      s"stored ${stored.size} vs stateless ${stateless.size}")
  }

  test("rolling the index forward makes later shards see earlier shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix2").toString
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 === 1)
    val c = docs.filter(col("doc_id") % 3 === 2)
    DedupIndexIO.writeIndex(a, dir, numHashes = 64, bands = 16)
    DedupIndexIO.appendToIndex(b, dir)
    val got = pairs(DedupIndexIO.probeIndex(spark, dir, c, threshold = 0.9))
    // the rolled index is exactly A ∪ B
    val want = pairs(graft.text.TextOps.incrementalLshPairs(
      a.unionByName(b), c, numHashes = 64, bands = 16, threshold = 0.9))
    assert(got == want && got.nonEmpty, s"got ${got.size} vs want ${want.size}")
    // probe results reference BOTH earlier shards
    val partners = got.map(_._2)
    val aIds = a.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val bIds = b.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(partners.exists(aIds), "no pair against the first shard")
    assert(partners.exists(bIds), "no pair against the appended shard")
  }

  test("sidecar validation stays loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix3").toString
    DedupIndexIO.writeIndex(docs.limit(20), dir, numHashes = 16, bands = 4)
    val side = java.nio.file.Paths.get(s"$dir/dedup_index.json")
    java.nio.file.Files.writeString(side, """{"format": 2, "num_hashes": 16, "bands": 4}""")
    val e1 = intercept[IllegalArgumentException](
      DedupIndexIO.probeIndex(spark, dir, docs.limit(5), 0.9))
    assert(e1.getMessage.contains("format"))
    java.nio.file.Files.delete(side)
    val e2 = intercept[IllegalArgumentException](DedupIndexIO.appendToIndex(docs.limit(5), dir))
    assert(e2.getMessage.contains("sidecar"))
  }

  test("row-local band buckets are bit-identical to the batch tokenTable route") {
    // the streaming probe kernel must produce EXACTLY the (id, bucket)
    // rows the batch shuffle route computes — same token hashes, same
    // masked-affine minhash, same banding md5 — or a streamed shard
    // would probe a different LSH space than the index it rolls into
    val d = docs.filter(col("doc_id") < 300)
    val batch = graft.text.TextOps.minhashBandBuckets(
        graft.text.TextOps.tokenTable(d), numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rowLocal = graft.text.TextOps.rowLocalBandBuckets(d, 64, 16)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rowLocal == batch && rowLocal.nonEmpty,
      s"row-local ${rowLocal.size} rows vs batch ${batch.size}")
  }
}
