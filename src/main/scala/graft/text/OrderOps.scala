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
    * Durability is the caller's choice (`reliable`):
    *  - `false` (default): `localCheckpoint` stores the sorted
    *    projection (id + one long here — a sliver of the corpus) in
    *    executor block storage; blocks are freed by the ContextCleaner
    *    when the frame is dropped. Fastest, but an executor lost
    *    between the two passes fails the job (never corrupts it).
    *  - `true`: reliable `checkpoint()` to the configured checkpoint
    *    dir (HDFS/object storage on a cluster) — survives executor
    *    decommissioning, costs one write+read of the projection. The
    *    checkpoint dir must be set; failing loudly here beats Spark's
    *    late error inside the job.
    */
  private def rangeSorted(df: DataFrame, key: Column, reliable: Boolean): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(p, key).sortWithinPartitions(key)
    // internal survivor: dead once the caller's result has executed
    graft.model.Lineage.cutRetired(sorted, reliable)
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
      idCol: String = "doc_id", textCol: String = "text",
      reliable: Boolean = false): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    val sorted = rangeSorted(base, col("id"), reliable).as[(Long, Long)]
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
      salt: String = "graft", idCol: String = "doc_id",
      reliable: Boolean = false): Unit = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val n = math.max(docs.count(), 1L)
    val order = shuffleOrder(docs, salt, idCol, reliable)
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
      idCol: String = "doc_id", reliable: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"),
      md5(concat_ws(":", lit(salt), col(idCol).cast("string"))).as("skey"))
    val sorted = rangeSorted(base, col("skey"), reliable).as[(Long, String)]
    // one RDD instance for both passes: rangeSorted's eager
    // localCheckpoint holds the sorted partitions as blocks, so the
    // count pass and the position pass both read them — the corpus is
    // sorted exactly once
    val sortedRdd = sorted.rdd
    val partials = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().toMap
    val offsets = exclusiveOffsets(partials, sortedRdd.getNumPartitions)
    val bc = spark.sparkContext.broadcast(offsets)
    sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var pos = bc.value(pid)
      it.map { case (id, _) =>
        val r = (id, pos)
        pos += 1
        r
      }
    }.toDF(idCol, "pos")
  }

  /** EPOCH-STREAM MATERIALIZATION — turn
    * [[graft.text.CorpusOps.epochRepeats]]' integer repeat counts into
    * the actual training stream: one row per (document, repeat) with a
    * deterministic global shuffle position, so the r-th copy of a
    * document lands at a reproducible place in the epoch and the
    * copies are SPREAD (the salted hash keys on (id, repeat), never
    * clumping a document's repeats together the way epoch-major
    * concatenation does). Same range-partition + per-partition prefix
    * count machinery as [[shuffleOrder]] — no global single-task sort.
    *
    * Input needs (idCol, n_repeats); returns (id, rep_idx, pos), pos
    * 0-based over the whole stream.
    */
  def epochStream(
      repeats: DataFrame, salt: String = "estream",
      idCol: String = "doc_id", reliable: Boolean = false): DataFrame = {
    val spark = repeats.sparkSession
    import spark.implicits._
    val base = repeats.filter(col("n_repeats") > 0)
      .select(col(idCol).cast("long").as("id"),
        explode(sequence(lit(1L), col("n_repeats"))).as("rep_idx"))
      .select(col("id"), col("rep_idx"),
        md5(concat_ws(":", lit(salt), col("id").cast("string"),
          col("rep_idx").cast("string"))).as("skey"))
    val sorted = rangeSorted(base, col("skey"), reliable).as[(Long, Long, String)]
    // one RDD instance: both passes read the checkpointed sorted
    // blocks (see shuffleOrder)
    val sortedRdd = sorted.rdd
    val partials = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().toMap
    val offsets = exclusiveOffsets(partials, sortedRdd.getNumPartitions)
    val bc = spark.sparkContext.broadcast(offsets)
    sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var pos = bc.value(pid)
      it.map { case (id, rep, _) =>
        val r = (id, rep, pos)
        pos += 1
        r
      }
    }.toDF(idCol, "rep_idx", "pos")
  }

  /** Exact linear-interpolated quantiles of a numeric column WITHOUT
    * buffering values anywhere: Spark's exact `percentile` aggregate
    * holds a value->count map in its single merging reducer, which on a
    * high-cardinality double column at corpus scale is an executor
    * OOM waiting to happen. Here the sorted multiset is materialized
    * only as range partitions: count rows per partition (one narrow
    * pass), locate the <= 2*|fracs| bracketing global row indices
    * inside whichever partitions own them (a second narrow pass that
    * emits only those rows), interpolate on the driver. Same
    * row-index semantics as `percentile`/`quantile_cont`:
    * pos = frac*(n-1), v[floor] + (v[ceil]-v[floor])*(pos-floor).
    * Driver state: partition counts + the requested values.
    */
  private[text] def exactQuantiles(
      df: DataFrame, scoreCol: String, fracs: Seq[Double],
      reliable: Boolean = false): Seq[Double] = {
    val spark = df.sparkSession
    import spark.implicits._
    // drop nulls like the percentile aggregate does (a null-scored row
    // would otherwise shift every row index by sorting first)
    val base = df.select(col(scoreCol).cast("double").as("s"))
      .filter(col("s").isNotNull)
    val sorted = rangeSorted(base, col("s"), reliable).as[Double]
    // ONE sort-shuffle for both passes: rangeSorted's eager
    // localCheckpoint materializes the sorted partitions, and sharing
    // one RDD instance makes both passes read those blocks (the
    // listener spec in RewriteSpec pins "exactly one shuffle write")
    val sortedRdd = sorted.rdd
    val partials = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().toMap
    val nParts = sortedRdd.getNumPartitions
    val offsets = exclusiveOffsets(partials, nParts)
    val n = partials.valuesIterator.sum
    require(n > 0, s"exactQuantiles($scoreCol) on an empty frame")
    val positions = fracs.map(f => f * (n - 1))
    val wanted = positions
      .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong))
      .distinct.sorted.toArray
    val bounds = offsets :+ n
    val bcW = spark.sparkContext.broadcast(wanted)
    val bcB = spark.sparkContext.broadcast(bounds)
    val found = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val lo = bcB.value(pid); val hi = bcB.value(pid + 1)
      val targets = bcW.value.filter(k => k >= lo && k < hi)
      if (targets.isEmpty) Iterator.empty
      else {
        val out = Array.newBuilder[(Long, Double)]
        var k = lo; var ti = 0
        while (it.hasNext && ti < targets.length) {
          val v = it.next()
          if (k == targets(ti)) { out += ((k, v)); ti += 1 }
          k += 1
        }
        out.result().iterator
      }
    }.collect().toMap
    positions.map { p =>
      val lo = math.floor(p).toLong; val hi = math.ceil(p).toLong
      if (lo == hi) found(lo)
      // lower + (higher - lower) * frac — operation-for-operation the
      // form both Spark percentile and DuckDB quantile_cont evaluate,
      // so cutoffs are bit-identical across engines
      else found(lo) + (found(hi) - found(lo)) * (p - lo)
    }
  }

  /** CURRICULUM ORDERING — easy-to-hard training order (Bengio et al.
    * 2009): documents are bucketed by exact quantiles of a difficulty
    * score (here any numeric column — length, perplexity, quality) and
    * laid out bucket-major, deterministically shuffled WITHIN each
    * bucket by the salted id hash. The order key is the string
    * `zero-padded bucket ++ ":" ++ md5(salt:id)` — lexicographic order
    * IS (bucket asc, hash) in both engines' binary collation, so the
    * same range-partition + prefix-count machinery as [[shuffleOrder]]
    * produces global positions with no single-task sort. The pad
    * width grows with nBuckets (min 2, matching the SQL oracle's
    * lpad(...,2)) so a 3-digit bucket can never sort before "11".
    *
    * Cutoffs come from [[exactQuantiles]] (range-partitioned row
    * lookup — no value-map aggregate anywhere), ROUNDED to 6 decimals
    * before the bucket comparison — both engines compute the identical
    * rounded cutoff, so bucket assignment is bit-stable (comparing on
    * raw interpolated doubles would gamble on the last ulp). Driver
    * state is nBuckets-1 doubles plus partition counts.
    *
    * Returns (id, bucket, pos), pos 0-based over the corpus.
    */
  def curriculumOrder(
      docs: DataFrame, nBuckets: Int = 10, scoreCol: String = "n_chars",
      salt: String = "curr", idCol: String = "doc_id",
      reliable: Boolean = false): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val fracs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val cutoffs = exactQuantiles(docs, scoreCol, fracs, reliable)
      // half-up at 6 decimals — the same rounding ROUND(q, 6) applies
      // in the SQL oracle (scores are non-negative here)
      .map(c => math.floor(c * 1e6 + 0.5) / 1e6)
    val bucketCol = cutoffs
      .map(c => when(col(scoreCol).cast("double") >= lit(c), 1).otherwise(0))
      .reduce(_ + _)
    val padW = math.max(2, (nBuckets - 1).toString.length)
    val base = docs.select(col(idCol).cast("long").as("id"), bucketCol.as("bucket"))
      .select(col("id"), col("bucket"),
        concat(format_string(s"%0${padW}d", col("bucket")), lit(":"),
          md5(concat_ws(":", lit(salt), col("id").cast("string")))).as("skey"))
    val sorted = rangeSorted(base, col("skey"), reliable).as[(Long, Int, String)]
    val partials = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().toMap
    val offsets = exclusiveOffsets(partials, sorted.rdd.getNumPartitions)
    val bc = spark.sparkContext.broadcast(offsets)
    sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var pos = bc.value(pid)
      it.map { case (id, bucket, _) =>
        val r = (id, bucket, pos)
        pos += 1
        r
      }
    }.toDF(idCol, "bucket", "pos")
  }

  /** PACKING-EFFICIENCY REPORT over [[packSequences]]: per training
    * sequence (bin), how many documents touch it and how many START in
    * it — the fragmentation/utilization health check of a packing run
    * (a bin touched by one long document is a contiguous span; a bin
    * where many short documents start is attention-mask-heavy). The
    * per-doc bin span explodes `sequence(start_bin, end_bin)` — cost
    * is total bins touched, linear in corpus tokens / capacity — and
    * one groupBy on the bin id rolls it up.
    *
    * Returns (bin, n_docs_touching, n_docs_starting), one row per bin.
    */
  def packBinStats(
      docs: DataFrame, capacity: Long,
      idCol: String = "doc_id", textCol: String = "text",
      reliable: Boolean = false): DataFrame =
    packSequences(docs, capacity, idCol, textCol, reliable)
      .select(col("start_bin"),
        explode(sequence(col("start_bin"), col("end_bin"))).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs_touching"),
        sum(when(col("start_bin") === col("bin"), 1L).otherwise(0L))
          .as("n_docs_starting"))

  /** The (position, payload) frame of one global layout: range-sort by
    * `key`, then the two-pass prefix machinery turns partition-local
    * iteration into an exact global position — shared by the
    * batching-waste and layout-stats reports. Returns rows
    * (pos, <payloadCols…>) with `pos` 0-based in `key` order.
    */
  private def globalPositions(
      base: DataFrame, keys: Seq[Column], payloadCols: Seq[String],
      reliable: Boolean): (DataFrame, Long) = {
    val spark = base.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    // MULTI-COLUMN keys, never a struct: Spark's sorter compares flat
    // key columns with codegen'd comparators (long keys get the radix
    // prefix); a struct key falls back to interpreted InternalRow
    // ordering and measured ~1.5× slower on the 10× replica. The
    // payload projection AFTER the sort keeps the shuffled rows narrow
    // and preserves per-partition order (narrow projection).
    val sortedDf = base
      .repartitionByRange(p, keys: _*).sortWithinPartitions(keys: _*)
      .select(payloadCols.map(col): _*)
    // ONE RDD instance for both passes. Without a checkpoint, the
    // second job reuses the first job's SHUFFLE FILES (same
    // ShuffleDependency) — only the partition-local re-sort re-runs,
    // so the corpus is shuffled exactly once and nothing data-sized
    // lands in block storage (a bench loop over a checkpointing
    // variant accretes blocks run over run). `reliable` callers still
    // get a durable cut.
    val sorted = if (reliable) graft.model.Lineage.cut(sortedDf, reliable) else sortedDf
    val sortedRdd = sorted.rdd
    val partials = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().toMap
    val n = partials.valuesIterator.sum
    val offsets = exclusiveOffsets(partials, sortedRdd.getNumPartitions)
    val bc = spark.sparkContext.broadcast(offsets)
    val fields = payloadCols
    val rows = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var pos = bc.value(pid)
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(
          pos +: fields.map(f => r.getAs[Any](f)))
        pos += 1
        out
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType) +:
        fields.map(f => sorted.schema(f)))
    (spark.createDataFrame(rows, schema), n)
  }

  /** EQUI-DEPTH HISTOGRAM — the other half of the CBO statistics pair
    * next to `RelOps.tableStats`: `buckets` rank-range buckets of
    * (value, id) order, each carrying its exact [lo, hi] envelope and
    * count — what a cost model reads to estimate range-predicate
    * selectivity on skewed columns where NDV alone misleads. Bucket
    * membership is `pos·B div n` over the EXACT global position (the
    * same two narrow range-sort passes as the packing/curriculum
    * family — no single-partition window, shuffle files reused across
    * the two passes), so ties split deterministically by the id
    * tiebreak and every bucket holds ⌊n/B⌋ or ⌈n/B⌉ rows by
    * construction. All integers; the value envelopes are exact column
    * values, never interpolations.
    */
  def equiDepthHistogram(
      df: DataFrame, valueCol: String, idCol: String, buckets: Int,
      reliable: Boolean = false): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(valueCol).cast("long").as("v"))
    val (pos, n) = globalPositions(
      base, Seq(col("v"), col("id")), Seq("id", "v"), reliable)
    pos.withColumn("bucket", expr(s"(pos * $buckets) div $n"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("cnt"))
  }

  /** PADDING-WASTE REPORT — the batching-efficiency decision table a
    * training pipeline reads before choosing its collation strategy.
    * Documents are truncated to `capacity` tokens; three strategies
    * are costed against the same corpus:
    *
    *  - `naive`: documents batched `batchSize` at a time in id order;
    *    each batch pads to its longest member, so cost =
    *    Σ batch_count·batch_max (the classic worst case: one long doc
    *    pads its whole batch).
    *  - `sorted`: the length-bucketing trick — batch in (length DESC,
    *    id) order, so near-equal lengths share a batch and padding
    *    shrinks, at the price of a global sort (which this operator
    *    prices with the SAME distributed range-sort it measures).
    *  - `packed`: [[packSequences]]' concat-and-chunk lower bound —
    *    ⌈Σtokens / capacity⌉ full sequences, no padding beyond the
    *    final partial one.
    *
    * Batch membership comes from the exact global position (two
    * narrow passes, no single-partition window): batch = pos div
    * batchSize. All token counts are integer-exact longs; the only
    * doubles are the waste fractions (padded−real)/padded — single
    * IEEE divisions of < 2^53 integers, bit-identical across engines.
    *
    * Returns one row per strategy: (strategy, n_batches,
    * padded_tokens, real_tokens, waste_frac).
    */
  def padWasteReport(
      docs: DataFrame, capacity: Long, batchSize: Int,
      idCol: String = "doc_id", textCol: String = "text",
      reliable: Boolean = false): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = docs.select(col(idCol).cast("long").as("id"),
      least(size(TextOps.tokens(col(textCol))).cast("long"), lit(capacity))
        .as("eff"))
    def batched(name: String, keys: Seq[Column]): DataFrame = {
      val (pos, _) = globalPositions(base, keys, Seq("eff"), reliable)
      pos.select(expr(s"pos div $batchSize").as("b"), col("eff"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("c"), max(col("eff")).as("m"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("c") * col("m")).as("padded_tokens"))
        .withColumn("strategy", lit(name))
    }
    val naive = batched("naive", Seq(col("id")))
    val sorted = batched("sorted", Seq((-col("eff")).as("ne"), col("id")))
    val tot = base.agg(sum(col("eff")).as("real_tokens"))
    val packed = tot.select(
      expr(s"(real_tokens + ${capacity - 1}L) div ${capacity}L").as("n_batches"))
      .select(col("n_batches"), (col("n_batches") * capacity).as("padded_tokens"))
      .withColumn("strategy", lit("packed"))
    naive.unionByName(sorted).unionByName(packed)
      .crossJoin(broadcast(tot))
      .select(col("strategy"), col("n_batches"), col("padded_tokens"),
        col("real_tokens"),
        ((col("padded_tokens") - col("real_tokens")).cast("double") /
          col("padded_tokens").cast("double")).as("waste_frac"))
      .orderBy(col("strategy"))
  }

  /** Z-ORDER LAYOUT STATS — the data-layout decision table for
    * multi-dimensional scan pruning. Interleaving the low `bits` bits
    * of two cluster keys (the Morton curve) and range-splitting the
    * sorted corpus into `files` equal slices bounds BOTH dimensions'
    * min/max range inside every file, so engine zone-maps (parquet
    * row-group stats, the exact mechanism Spark's parquet filter
    * pushdown prunes with) can skip files for predicates on EITHER
    * key; a linear (x, y) sort gives perfect x pruning and useless y
    * pruning. This operator emits the per-file (min, max) envelope of
    * both layouts over the same rows — the measured basis for
    * choosing, instead of folklore.
    *
    * File assignment is `pos · files div n` over the exact global
    * position in key order (writeShards' equal-split contract:
    * deterministic, ±1 balanced, no sampled partitioner boundaries and
    * no single-partition window). `tieCol` must be row-unique — it
    * totalizes the order so the split is reproducible bit-for-bit.
    *
    * Returns (layout ∈ {linear, zorder}, file_id, n_rows, x_min,
    * x_max, y_min, y_max).
    */
  def zorderLayoutStats(
      df: DataFrame, xCol: Column, yCol: Column, tieCol: Column,
      files: Int = 32, bits: Int = 16,
      reliable: Boolean = false): DataFrame = {
    require(files >= 2, s"files must be >= 2, got $files")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1L
    val base = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"),
      tieCol.cast("long").as("tie"))
    val zkey = (0 until bits).map { k =>
      shiftleft(shiftright(col("x").bitwiseAND(lit(mask)), k).bitwiseAND(lit(1L)),
        2 * k) +
        shiftleft(shiftright(col("y").bitwiseAND(lit(mask)), k).bitwiseAND(lit(1L)),
          2 * k + 1)
    }.reduce(_ + _)
    def layout(name: String, keys: Seq[Column]): DataFrame = {
      val (pos, n) = globalPositions(base, keys, Seq("x", "y"), reliable)
      pos.select(expr(s"(pos * $files) div ${n}L").as("file_id"),
          col("x"), col("y"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .withColumn("layout", lit(name))
    }
    layout("linear", Seq(col("x"), col("y"), col("tie")))
      .unionByName(layout("zorder", Seq(zkey.as("z"), col("tie"))))
      .select(col("layout"), col("file_id"), col("n_rows"),
        col("x_min"), col("x_max"), col("y_min"), col("y_max"))
      .orderBy(col("layout"), col("file_id"))
  }
}
