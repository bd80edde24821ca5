package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** END-TO-END pipeline integration: the full corpus-to-trainer chain —
  * select -> decontaminate -> near-dup removal -> shuffle -> pack ->
  * shard sink — composed exactly as a user would compose it, with the
  * cross-operator contracts asserted (id sets flow consistently, the
  * packed stream covers every surviving token, the written shards
  * reassemble the selection). Each operator has its own unit/oracle
  * coverage; this spec guards the SEAMS.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("select -> decontaminate -> dedup -> shuffle -> pack -> shards composes consistently") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // 1. quality selection (lang + repetition + exact-dedup keepers +
    // token floor) — returns (doc_id, n_tokens)
    val selected = CorpusOps.selectCorpus(docs, lang = "en",
      minWords = 10, maxTopTokenRatio = 0.5)
    val selectedIds = selected.collect().map(_.getLong(0)).toSet
    assert(selectedIds.nonEmpty)

    // 2. decontamination against a fake eval suite (every 20th doc)
    val corpus = docs.join(selected.select(col("doc_id")), "doc_id")
    val eval_ = docs.filter(col("doc_id") % 20 === 0)
    val clean = CorpusOps.decontaminate(corpus, eval_)
    val cleanIds = clean.collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(cleanIds.subsetOf(selectedIds))
    assert(cleanIds.intersect(selectedIds.filter(_ % 20 == 0)).isEmpty,
      "eval-exact docs survived decontamination")

    // 3. near-dup removal: winnow candidates -> exact verify -> CC
    // clusters -> keepers
    val pairs = TextOps.verifyPairsNgramJaccard(clean,
      TextOps.winnowPairs(clean, k = 8, w = 4, minShared = 3, maxDf = 50),
      n = 3, threshold = 0.8)
    val clusters = TextOps.dedupClusters(clean, pairs)
    val keepers = clusters.filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"))
    val keeperIds = keepers.collect().map(_.getLong(0)).toSet
    assert(keeperIds.subsetOf(cleanIds) && keeperIds.nonEmpty)

    // 4. deterministic training order over the survivors
    val kept = clean.join(keepers, "doc_id")
    val order = OrderOps.shuffleOrder(kept, salt = "pipe1")
    val orderRows = order.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(orderRows.keySet == keeperIds)
    assert(orderRows.values.toSeq.sorted == (0L until keeperIds.size).toList,
      "positions are not a dense permutation")

    // 5. packing covers every token exactly once: total bins consume
    // the total token mass
    val packed = OrderOps.packSequences(kept, capacity = 64)
    val packRows = packed.collect()
    assert(packRows.map(_.getLong(0)).toSet == keeperIds)
    val totalTokens = packRows.map(_.getLong(1)).sum
    val lastEnd = packRows.map(_.getLong(3)).max
    assert(lastEnd == math.max(totalTokens - 1, 0) / 64,
      s"last bin $lastEnd inconsistent with $totalTokens tokens at capacity 64")

    // 6. shard sink: written shards reassemble the survivors in the
    // deterministic order
    val out = java.nio.file.Files.createTempDirectory("graft-pipe-shards").toString
    OrderOps.writeShards(kept, out, numShards = 3, salt = "pipe1")
    val back = spark.read.parquet(out)
    assert(back.count() == keeperIds.size)
    val backRows = back.select(col("doc_id"), col("pos")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(backRows == orderRows, "shard export disagrees with the declared order")
  }
}
