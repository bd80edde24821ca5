package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[AnnIndexIO]] — the persisted IVF index: a stored probe must equal
  * the in-memory [[graft.vector.VectorOps.ivfTopK]] exactly, appends
  * must extend the searchable set under the ORIGINAL quantizer (and
  * refuse centroid-redefining ids), and the sidecar must stay loud.
  */
class AnnIndexIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("stored probe equals the in-memory IVF operator exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-aix").toString
    AnnIndexIO.writeIndex(emb, dir, nlist = 16)
    assert(AnnIndexIO.storedParams(dir)._1 == 16)
    val stored = rows(AnnIndexIO.probeIndex(spark, dir, emb, nprobe = 4, k = 5))
    val fresh = rows(graft.vector.VectorOps.ivfTopK(emb, nlist = 16, nprobe = 4, k = 5))
    assert(stored == fresh && stored.nonEmpty,
      s"stored ${stored.size} vs fresh ${fresh.size}")
  }

  test("append extends the searchable set under the original quantizer; low ids refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft-aix2").toString
    val base = emb.filter(col("vec_id") % 2 === 0 || col("vec_id") < 16)
    val shard = emb.filter(col("vec_id") % 2 === 1 && col("vec_id") >= 16)
    AnnIndexIO.writeIndex(base, dir, nlist = 16)
    AnnIndexIO.appendToIndex(shard, dir)
    // probing after the roll-forward == a fresh index over the union
    val full = java.nio.file.Files.createTempDirectory("graft-aix3").toString
    AnnIndexIO.writeIndex(emb, full, nlist = 16)
    val rolled = rows(AnnIndexIO.probeIndex(spark, dir, emb, nprobe = 4, k = 5))
    val direct = rows(AnnIndexIO.probeIndex(spark, full, emb, nprobe = 4, k = 5))
    assert(rolled == direct && rolled.nonEmpty)
    // an append carrying a centroid-range id must fail loudly
    val e = intercept[IllegalArgumentException] {
      AnnIndexIO.appendToIndex(emb.filter(col("vec_id") === 3), dir)
    }
    assert(e.getMessage.contains("quantizer"))
  }

  test("missing or wrong-format sidecar fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-aix4").toString
    val e1 = intercept[IllegalArgumentException](AnnIndexIO.storedParams(dir))
    assert(e1.getMessage.contains("sidecar"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ann_index.json"),
      """{"format": 9, "nlist": 16, "dims": 64}""")
    val e2 = intercept[IllegalArgumentException](AnnIndexIO.storedParams(dir))
    assert(e2.getMessage.contains("format"))
  }
}
