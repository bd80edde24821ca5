package graft.io

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** PERSISTED near-dup index — the state of an INCREMENTAL dedup
  * pipeline. [[TextOps.incrementalLshPairs]] shows the probe shape but
  * recomputes the base corpus per call; a production ingest computes
  * the corpus index ONCE, persists it, and each arriving shard probes
  * and then JOINS the index — O(shard) work per ingest against 100 TB
  * of history, never a re-pairing of the history with itself.
  *
  * Layout (both tables id-keyed parquet, linear in the corpus):
  *   <path>/buckets/        (id, bucket)  — the LSH banding index
  *   <path>/tokens/         (id, w)       — the exact-verify payload
  *   <path>/dedup_index.json  {"format": 1, "num_hashes": H, "bands": B}
  *
  * Storing the token table keeps the family's central guarantee —
  * probe results are EXACT-verified Jaccard pairs, a subset of the
  * exact join — rather than signature estimates. The sidecar pins the
  * banding parameters; readers take them FROM the sidecar, so a probe
  * can never silently band a shard differently than the index it
  * probes (sidecar written LAST — a torn write stays detectable, the
  * [[TokenizerIO]] contract).
  */
object DedupIndexIO {

  def writeIndex(
      docs: DataFrame, path: String, numHashes: Int, bands: Int,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val tok = TextOps.tokenTable(docs, idCol, textCol)
    TextOps.minhashBandBuckets(tok, numHashes, bands)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/buckets")
    tok.write.mode(SaveMode.Overwrite).parquet(s"$path/tokens")
    Files.createDirectories(Paths.get(path))
    Sidecars.writeAtomic(Paths.get(s"$path/dedup_index.json"),
      s"""{"format": 1, "num_hashes": $numHashes, "bands": $bands}""")
  }

  /** Roll the index forward: append a shard's buckets and tokens under
    * the SIDEcar's banding parameters. Append-only parquet writes —
    * the ingest transaction is the caller's (run [[probeIndex]] on the
    * shard BEFORE appending it, or its rows pair with themselves).
    *
    * TORN-APPEND ORDER: tokens are appended BEFORE buckets. A crash
    * between the two writes then leaves token rows no bucket points at
    * — dead weight, harmlessly re-appendable — never bucket rows whose
    * ids have no token payload, which would make later [[probeIndex]]
    * candidates against those ids silently vanish at the exact-verify
    * inner join (false-negative dup pairs). The buckets write is the
    * commit point, mirroring writeIndex's sidecar-last contract.
    */
  def appendToIndex(
      docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val (numHashes, bands) = storedParams(path)
    val tok = TextOps.tokenTable(docs, idCol, textCol)
    tok.write.mode(SaveMode.Append).parquet(s"$path/tokens")
    TextOps.minhashBandBuckets(tok, numHashes, bands)
      .write.mode(SaveMode.Append).parquet(s"$path/buckets")
  }

  /** Validated sidecar read → (numHashes, bands). */
  def storedParams(path: String): (Int, Int) = {
    val p = Paths.get(s"$path/dedup_index.json")
    require(Files.exists(p),
      s"missing dedup-index sidecar $p — not an index directory " +
        "(or an interrupted writeIndex)")
    val s = Files.readString(p)
    def field(k: String): Option[Int] =
      (s""""$k"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(s).map(_.group(1).toInt)
    require(field("format").contains(1),
      s"unsupported dedup-index format ${field("format").getOrElse("<absent>")} " +
        s"in $p (this reader understands format 1)")
    val h = field("num_hashes"); val b = field("bands")
    require(h.isDefined && b.isDefined,
      s"dedup-index sidecar $p lacks num_hashes/bands")
    (h.get, b.get)
  }

  /** Probe the stored index with an arriving shard: the shard's band
    * buckets (computed under the SIDEcar's parameters) equi-join the
    * stored buckets, cross-side candidates exact-verify against the
    * union token table. Returns (id_a = shard doc, id_b = indexed doc,
    * jaccard) — exactly [[TextOps.incrementalLshPairs]]' output with
    * the base side read instead of recomputed. Caller contract: shard
    * ids are disjoint from indexed ids.
    */
  def probeIndex(
      spark: SparkSession, path: String, incoming: DataFrame,
      threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (numHashes, bands) = storedParams(path)
    val baseBuckets = spark.read.parquet(s"$path/buckets")
    val baseTok = spark.read.parquet(s"$path/tokens")
    val tokI = TextOps.tokenTable(incoming, idCol, textCol)
    val cand = TextOps.minhashBandBuckets(tokI, numHashes, bands)
      .toDF("id_a", "bucket")
      .join(baseBuckets.toDF("id_b", "bucket"), "bucket")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    TextOps.verifyJaccardCandidates(
      tokI.union(baseTok).distinct(), cand, threshold)
  }
}
