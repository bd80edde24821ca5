package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[CorpusIO]] — JSONL interchange roundtrip and the corrupt-line
  * accounting contract: a truncated/garbage line is counted and
  * quarantined, never silently dropped, and never perturbs the parse
  * of its neighbors.
  */
class CorpusIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("jsonl roundtrip preserves the documents table exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    CorpusIO.writeJsonl(docs, dir)
    val back = CorpusIO.readJsonlClean(spark, dir)
    assert(back.schema.fieldNames.sorted.toSeq ==
      docs.schema.fieldNames.sorted.toSeq)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(key(back).toSeq == key(docs).toSeq)
  }

  test("corrupt and key-less lines are accounted, good neighbors parse unaffected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl2").toString
    // hand-written shard: 2 good lines, 1 truncated JSON, 1 garbage,
    // 1 valid JSON without doc_id
    val lines = Seq(
      """{"doc_id": 1, "text": "good one", "lang": "en", "source": "web", "n_chars": 8}""",
      """{"doc_id": 2, "text": "good two", "lang": "de", "source": "book", "n_chars": 8}""",
      """{"doc_id": 3, "text": "truncat""",
      """not json at all""",
      """{"text": "keyless", "lang": "en", "source": "web", "n_chars": 7}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-00000.json"), lines.mkString("\n"))
    val all = CorpusIO.readJsonl(spark, dir)
    val rep = CorpusIO.ingestReport(all).head()
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2), rep.getLong(3)) ==
      ((5L, 3L, 2L, 1L)), s"report: $rep")
    // quarantined lines carry their raw text for replay
    val bad = CorpusIO.quarantine(all)
      .select(col("raw_line")).collect().map(_.getString(0)).sorted
    assert(bad.toSeq ==
      Seq("""{"doc_id": 3, "text": "truncat""", "not json at all").sorted)
    // the clean view is exactly the two good rows
    val good = CorpusIO.readJsonlClean(spark, dir)
      .filter(col("doc_id").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(good.toSeq == Seq((1L, "good one"), (2L, "good two")))
  }

  test("csv roundtrip preserves the documents table; malformed rows account under the same contract") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    CorpusIO.writeCsv(docs, dir)
    val back = CorpusIO.readCsvClean(spark, dir)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(key(back).toSeq == key(docs).toSeq)
    // hand shard: 2 good rows, a type-corrupt n_chars, a short row
    val dir2 = java.nio.file.Files.createTempDirectory("graft-csv2").toString
    val lines = Seq(
      "doc_id,text,lang,source,n_chars",
      "1,good one,en,web,8",
      "2,good two,de,book,8",
      "3,bad count,en,web,notanumber",
      "4,short row,en")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir2/part-00000.csv"), lines.mkString("\n"))
    val all = CorpusIO.readCsv(spark, dir2)
    val rep = CorpusIO.ingestReport(all).head()
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2)) == ((4L, 2L, 2L)),
      s"report: $rep")
    // quarantine carries the raw malformed rows for replay
    val bad = CorpusIO.quarantine(all)
      .select(col("raw_line")).collect().map(_.getString(0)).sorted
    assert(bad.toSeq == Seq("3,bad count,en,web,notanumber", "4,short row,en").sorted,
      s"quarantine: ${bad.toSeq}")
    val good = CorpusIO.readCsvClean(spark, dir2)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(good.toSeq == Seq((1L, "good one"), (2L, "good two")))
  }

  test("streaming ingest report converges to the batch report as shards arrive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl3").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/shard-0.json"),
      Seq(
        """{"doc_id": 1, "text": "a", "lang": "en", "source": "web", "n_chars": 1}""",
        """broken line""").mkString("\n"))
    val q = CorpusIO.ingestReport(CorpusIO.readJsonlStream(spark, dir))
      .writeStream.format("memory").queryName("jsonl_ingest")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // a second shard lands mid-stream: the report must absorb it
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/shard-1.json"),
        Seq(
          """{"doc_id": 2, "text": "b", "lang": "de", "source": "book", "n_chars": 1}""",
          """{"text": "keyless", "lang": "en", "source": "web", "n_chars": 7}""").mkString("\n"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("jsonl_ingest").head()
    val batch = CorpusIO.ingestReport(CorpusIO.readJsonl(spark, dir)).head()
    assert(streamed.toSeq == batch.toSeq, s"stream $streamed vs batch $batch")
    assert((batch.getLong(0), batch.getLong(1), batch.getLong(2), batch.getLong(3)) ==
      ((4L, 3L, 1L, 1L)))
  }

  test("ingestReport judges lines under the FULL schema, not a pruned one") {
    // a line malformed ONLY in n_chars (a string where the schema says
    // long): if required-schema pruning parsed just (_corrupt_record,
    // doc_id) for the report, this line would count as parsed there
    // while readJsonlClean (full schema in play) marks it corrupt and
    // drops it — report and corpus must agree
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl4").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/shard-0.json"),
      Seq(
        """{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}""",
        """{"doc_id": 2, "text": "bad", "lang": "en", "source": "web", "n_chars": "oops"}""")
        .mkString("\n"))
    val rep = CorpusIO.ingestReport(CorpusIO.readJsonl(spark, dir)).head()
    // full-row collect (a bare count() would itself prune to the
    // corrupt column and trip QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val nClean = CorpusIO.readJsonlClean(spark, dir).collect().length.toLong
    assert(rep.getLong(1) == nClean,
      s"report n_parsed ${rep.getLong(1)} != clean rows $nClean")
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2)) == ((2L, 1L, 1L)),
      s"report: $rep")
  }
}
