package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.text.TextOps

/** [[SketchIO]] — the persisted HLL register store: a sharded
  * create/append history must estimate EXACTLY like one pass over the
  * union corpus (max-merge is lossless), duplicate appends must be
  * no-ops (idempotence is the store's whole torn-write story), the
  * sidecar must pin the n-gram size against mixed-parameter appends,
  * and a missing/foreign sidecar must fail loudly.
  */
class SketchIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def est(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toMap

  private def onePass(d: org.apache.spark.sql.DataFrame, n: Int) =
    est(TextOps.hllEstimate(TextOps.hllShingleRegisters(d, n))
      .select(col("source"), round(col("est"), 4).as("hll_est")))

  test("sharded store estimates exactly like one pass over the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skx").toString
    SketchIO.writeSketch(docs.filter(col("doc_id") % 3 === 0), dir, n = 3)
    SketchIO.appendToSketch(docs.filter(col("doc_id") % 3 === 1), dir)
    SketchIO.appendToSketch(docs.filter(col("doc_id") % 3 === 2), dir)
    val stored = est(SketchIO.estimateFromStore(spark, dir))
    val fresh = onePass(docs, 3)
    assert(stored == fresh && stored.nonEmpty,
      s"stored ${stored.size} sources vs fresh ${fresh.size}")
  }

  test("re-appending the same shard is a no-op (idempotent max-merge)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ski").toString
    SketchIO.writeSketch(docs.filter(col("doc_id") % 2 === 0), dir, n = 3)
    val shard = docs.filter(col("doc_id") % 2 === 1)
    SketchIO.appendToSketch(shard, dir)
    val once = est(SketchIO.estimateFromStore(spark, dir))
    SketchIO.appendToSketch(shard, dir) // a retried torn append
    SketchIO.appendToSketch(shard, dir)
    val thrice = est(SketchIO.estimateFromStore(spark, dir))
    assert(once == thrice, "duplicate appends changed an estimate")
    // and the merged register table stays sources x <= 256
    val m = SketchIO.mergedRegisters(spark, dir)
    val perSource = m.groupBy("source").count().collect().map(_.getLong(1))
    assert(perSource.forall(_ <= 256L))
  }

  test("appends sketch under the STORED n-gram size, not a caller default") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skn").toString
    SketchIO.writeSketch(docs.filter(col("doc_id") % 2 === 0), dir, n = 2)
    assert(SketchIO.storedNgram(dir) == 2)
    SketchIO.appendToSketch(docs.filter(col("doc_id") % 2 === 1), dir)
    val stored = est(SketchIO.estimateFromStore(spark, dir))
    assert(stored == onePass(docs, 2),
      "append must inherit n = 2 from the sidecar")
  }

  test("missing or wrong-format sidecar fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skm").toString
    val e = intercept[IllegalArgumentException] {
      SketchIO.estimateFromStore(spark, dir.toString)
    }
    assert(e.getMessage.contains("sidecar"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/sketch.json"),
      """{"format": 2, "p": 8, "ngram": 3}""")
    val e2 = intercept[IllegalArgumentException] {
      SketchIO.storedNgram(dir.toString)
    }
    assert(e2.getMessage.contains("format"))
  }
}
