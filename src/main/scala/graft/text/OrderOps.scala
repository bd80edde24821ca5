package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Global-ORDER operators — sequence packing and training-order
  * shuffling, the two passes a pretraining pipeline runs between "the
  * corpus is filtered" and "tokens hit the trainer". Both need an
  * exact global prefix over a total order, which a naive
  * `Window.orderBy` computes in ONE task (the classic single-partition
  * window scale-killer). Here the prefix is computed the distributed
  * way: range-repartition on the order key, per-partition partials in
  * one pass, a partition-count-sized collect (thousands of longs, not
  * data), broadcast offsets, second pass adds them. Wall-clock is two
  * narrow passes over range-partitioned data at any scale.
  */
object OrderOps {

  /** Range-partition `df` by `key`, sort within partitions, and
    * checkpoint so the two prefix passes read the sorted blocks
    * instead of re-shuffling. Returns the checkpointed frame.
    *
    * Scale note: `localCheckpoint` stores the sorted projection
    * (id + one long here — a sliver of the corpus) in executor block
    * storage; blocks are freed by the ContextCleaner when the frame is
    * dropped. On a cluster with aggressive executor decommissioning,
    * swap for reliable `checkpoint()` — block loss between the two
    * passes would otherwise fail the job (never corrupt it).
    */
  private def rangeSorted(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(p, key).sortWithinPartitions(key).localCheckpoint()
  }

  /** Per-partition exclusive offsets of `partials` (pid -> partition
    * total), as an array indexed by partition id.
    */
  private def exclusiveOffsets(partials: Map[Int, Long], nParts: Int): Array[Long] = {
    val offsets = new Array[Long](math.max(nParts, 1))
    var acc = 0L
    var p = 0
    while (p < nParts) { offsets(p) = acc; acc += partials.getOrElse(p, 0L); p += 1 }
    offsets
  }

  /** SEQUENCE PACKING, concat-and-chunk style (the GPT-lineage packing
    * scheme): documents are laid out in deterministic `idCol` order as
    * one virtual token stream and cut into fixed-`capacity` training
    * sequences; each document reports the first and last sequence it
    * lands in (a document longer than `capacity` spans several, a
    * zero-token document sits at its boundary with `start == end`).
    *
    * Returns (id, n_tokens, start_bin, end_bin) — integer-exact, so
    * the operator is reproducible bit-for-bit across engines and
    * cluster sizes, unlike RNG- or partition-order-dependent packers.
    */
  def packSequences(
      docs: DataFrame, capacity: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    val sorted = rangeSorted(base, col("id")).as[(Long, Long)]
    val partials = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator.single(pid -> s)
      }.collect().toMap
    val offsets = exclusiveOffsets(partials, sorted.rdd.getNumPartitions)
    val bc = spark.sparkContext.broadcast(offsets)
    sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = bc.value(pid)
      it.map { case (id, n) =>
        val start = cum / capacity
        val end = (cum + math.max(n, 1L) - 1L) / capacity
        cum += n
        (id, n, start, end)
      }
    }.toDF(idCol, "n_tokens", "start_bin", "end_bin")
  }

  /** TRAINING-SHARD SINK: write the corpus as `numShards` contiguous
    * slices of the deterministic [[shuffleOrder]], one partition
    * directory per shard, rows inside each shard in training order —
    * the export step between "corpus selected" and "trainer reads
    * shard files". Shard boundaries are `pos * numShards div n`
    * (integer math), so shards are equal-sized ±1 and the assignment
    * is reproducible across runs and cluster sizes. One range
    * repartition on (shard, pos) co-locates and orders each shard's
    * rows before the write, so each shard directory holds ordered
    * files rather than interleaved fragments.
    */
  def writeShards(
      docs: DataFrame, outDir: String, numShards: Int,
      salt: String = "graft", idCol: String = "doc_id"): Unit = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val n = math.max(docs.count(), 1L)
    val order = shuffleOrder(docs, salt, idCol)
    docs.join(order, idCol)
      .withColumn("shard", expr(s"CAST((pos * $numShards) div ${n}L AS INT)"))
      .repartitionByRange(numShards, col("shard"), col("pos"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** DETERMINISTIC training-order shuffle: every document gets a
    * global position by sorting on a salted hash of its id —
    * reproducible across runs, engines, and cluster sizes (no RNG
    * state, no partition-order dependence), and changing the salt
    * reshuffles without touching the corpus. md5 keys are unique for
    * unique ids, so the order is total.
    *
    * Returns (id, pos) with pos in [0, N).
    */
  def shuffleOrder(
      docs: DataFrame, salt: String = "graft",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"),
      md5(concat_ws(":", lit(salt), col(idCol).cast("string"))).as("skey"))
    val sorted = rangeSorted(base, col("skey")).as[(Long, String)]
    val partials = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().toMap
    val offsets = exclusiveOffsets(partials, sorted.rdd.getNumPartitions)
    val bc = spark.sparkContext.broadcast(offsets)
    sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var pos = bc.value(pid)
      it.map { case (id, _) =>
        val r = (id, pos)
        pos += 1
        r
      }
    }.toDF(idCol, "pos")
  }
}
