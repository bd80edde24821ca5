package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the de-facto wire format of LLM training
  * corpora (one JSON document per line: The Pile, RedPajama, Dolma all
  * ship this way). The raster side has its parquet tile store
  * ([[TileIO]]); this is the text side's ingest/egress pair, with the
  * property a 100 TB ingest actually needs: MALFORMED LINES ARE
  * ACCOUNTED, NOT SILENTLY DROPPED — a crawler's truncated shard or a
  * mid-line disk error must show up in an ingest report, not vanish.
  *
  * Reading uses Spark's PERMISSIVE JSON mode with an explicit schema
  * (never inference — a schema scan over 100 TB is a full extra pass,
  * and inference lets one bad shard silently change column types):
  * parseable lines become typed rows, unparseable lines land intact in
  * the corrupt-record column for counting/quarantine. Everything is a
  * line-parallel scan; no shuffle anywhere on the ingest path.
  */
object CorpusIO {

  /** The documents-table schema (TESTDATA.md) + the corrupt-line
    * capture column.
    */
  val corruptCol = "_corrupt_record"

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val readSchema: StructType =
    StructType(docSchema.fields :+ StructField(corruptCol, StringType))

  /** Egress: one JSON object per line, the interchange layout. */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.write.mode(SaveMode.Overwrite).json(path)

  /** Ingest with corrupt-line capture: returns every input line as a
    * row — parsed columns for good lines, NULLs + the raw line in
    * `_corrupt_record` for bad ones. Callers filter or quarantine;
    * [[ingestReport]] summarizes.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** The parsed corpus alone (bad lines dropped — AFTER accounting;
    * pair with [[ingestReport]] so the drop is never silent).
    */
  def readJsonlClean(spark: SparkSession, path: String): DataFrame =
    readJsonl(spark, path).filter(col(corruptCol).isNull).drop(corruptCol)

  /** STREAMING ingest of an arriving JSONL corpus (the file-drop
    * deployment shape: crawler shards land in a directory, the
    * pipeline tails it). Same explicit schema, same PERMISSIVE
    * corrupt-line capture — [[ingestReport]] over this frame is a
    * streaming aggregation whose Complete-mode output converges to
    * the batch report on the same files (StreamSpec pins the parity),
    * so ingest health is monitorable WHILE shards arrive, not after.
    */
  def readJsonlStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** CSV twin of the JSONL pair — the OTHER interchange format corpus
    * drops arrive in (spreadsheet exports, warehouse UNLOADs). Same
    * contract exactly: explicit schema (never inference), PERMISSIVE
    * mode with the malformed line captured intact in the corrupt
    * column, line-parallel scan (multiLine stays off — a 100 TB CSV
    * with embedded newlines cannot split by line and should be
    * re-exported, not limped through). [[quarantine]] and
    * [[ingestReport]] are format-agnostic and serve both readers,
    * full-schema guard included.
    */
  def writeCsv(docs: DataFrame, path: String): Unit =
    docs.write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("header", "true")
      .csv(path)

  /** The parsed CSV corpus alone — pair with [[ingestReport]], as with
    * the JSONL form, so the drop is never silent.
    */
  def readCsvClean(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path).filter(col(corruptCol).isNull).drop(corruptCol)

  /** The raw text of every unparseable line, for replay or
    * quarantine. The projection keeps `doc_id` alongside the corrupt
    * column because Spark (SPARK-38523 contract) refuses a query over
    * raw JSON whose referenced columns are ONLY the internal corrupt
    * record column — co-projecting a parsed column is the sanctioned
    * shape.
    */
  def quarantine(lines: DataFrame): DataFrame = {
    // FULL-SCHEMA GUARD (the ingestReport contract): without it,
    // required-schema pruning parses only (doc_id, corrupt), and a row
    // malformed ONLY in an unreferenced column (a CSV n_chars that
    // fails to coerce, say) parses clean under the pruned schema and
    // silently escapes quarantine while readCsvClean/readJsonlClean —
    // full schema in play — drop it.
    val parsedCols = lines.columns.filterNot(_ == corruptCol).map(col).toSeq
    val touchAll =
      if (parsedCols.isEmpty) lit(true)
      else hash(parsedCols: _*) >= lit(Int.MinValue)
    lines.filter(col(corruptCol).isNotNull && touchAll)
      // coalesce keeps a GENUINE doc_id reference in the plan even if
      // the caller projects raw_line alone — column pruning cannot
      // reduce the scan to the corrupt column only (the filter already
      // guarantees the corrupt branch wins, so values are unchanged)
      .select(col("doc_id"),
        coalesce(col(corruptCol), col("doc_id").cast("string")).as("raw_line"))
  }

  /** One-row ingest health report: total lines, parsed lines, corrupt
    * lines, and parsed lines missing the primary key (a line can be
    * valid JSON and still lack doc_id — schema-valid but unusable).
    * One aggregation over the line scan.
    *
    * FULL-SCHEMA GUARD: the aggregation references every parsed
    * column (through a never-foldable hash comparison), because
    * Spark's JSON required-schema pruning otherwise parses only the
    * columns the plan mentions — a line malformed ONLY in an
    * unreferenced column (say a string where n_chars should be) would
    * count as parsed in a (corrupt, doc_id)-pruned report while
    * [[readJsonlClean]], with the full schema in play, marks it
    * corrupt and drops it. The guard makes report and corpus judge
    * every line under the SAME schema, which is the whole "accounted,
    * not silently dropped" invariant.
    */
  def ingestReport(lines: DataFrame): DataFrame = {
    val parsedCols = lines.columns.filterNot(_ == corruptCol).map(col).toSeq
    val touchAll =
      if (parsedCols.isEmpty) lit(true)
      // always true, but Catalyst has no rule to fold a hash range
      // check — the attribute references survive into the scan's
      // required schema
      else hash(parsedCols: _*) >= lit(Int.MinValue)
    lines.agg(
      count(when(touchAll, 1)).as("n_lines"),
      count(when(col(corruptCol).isNull, 1)).as("n_parsed"),
      count(col(corruptCol)).as("n_corrupt"),
      count(when(col(corruptCol).isNull && col("doc_id").isNull, 1))
        .as("n_missing_id"))
  }
}
