package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Structural scale-slope proofs for the CC/join-heavy operators,
  * measured on a 10x in-memory replica built by
  * [[graft.ScaleData.replicateDocuments]] (token-disjoint copies: the
  * corpus-growth model, not duplication blow-up). Wall-clock slopes
  * live in SCALE.md; these specs pin the underlying WORK metrics —
  * candidate-pair counts and label-propagation rounds — which are what
  * actually decide whether the operators survive 100 TB, and which are
  * immune to machine-load noise.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val d1 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  lazy val d10 = graft.ScaleData.replicateDocuments(d1, 10).persist()

  /** The 10x lineitem replica (SCALE.md protocol: testdata-x10 =
    * sf0.1 replicated via [[graft.ScaleData]]). The directory is
    * gitignored, so a fresh checkout doesn't carry it — generate the
    * one table these specs read on demand instead of failing on a
    * clean sandbox (one ~6M-row write, first run only).
    */
  lazy val li10: org.apache.spark.sql.DataFrame = {
    val p = "/root/repo/testdata-x10/lineitem.parquet"
    if (!new java.io.File(p).exists())
      graft.ScaleData.replicateKeyed(
          spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet"),
          10, Seq("l_orderkey"))
        .write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("MinHash LSH candidate pairs grow linearly under 10x corpus replication") {
    // copies are token-disjoint, so each of the 10 shards reproduces
    // exactly the 1x verified pair set and nothing across shards: the
    // 10x count must be 10x the 1x count up to band-collision noise
    val p1 = TextOps.minhashLshPairs(d1, numHashes = 64, bands = 16, threshold = 0.95).count()
    val p10 = TextOps.minhashLshPairs(d10, numHashes = 64, bands = 16, threshold = 0.95).count()
    assert(p1 > 0, "degenerate fixture: no near-dup pairs at 1x")
    assert(p10 <= 10 * p1 + math.max(10L, p1 / 10),
      s"LSH pairs superlinear: $p1 at 1x but $p10 at 10x — bucket blow-up")
    assert(p10 >= 10 * p1 - math.max(10L, p1 / 10),
      s"LSH pairs sublinear: $p1 at 1x but $p10 at 10x — replica lost pairs")
  }

  test("containment candidate pairs grow linearly under 10x corpus replication") {
    def cand(df: org.apache.spark.sql.DataFrame): Long =
      TextOps.containmentPairs(TextOps.tokenTable(df), 0.8).count()
    val c1 = cand(d1)
    val c10 = cand(d10)
    assert(c1 > 0, "degenerate fixture: no containment pairs at 1x")
    assert(c10 <= 10 * c1 + math.max(10L, c1 / 10),
      s"containment pairs superlinear: $c1 at 1x vs $c10 at 10x — prefix filter not binding")
  }

  test("ExactSubstr duplicated-anchor count grows linearly under 10x corpus replication") {
    // copies are token-disjoint, so duplicated n-gram structure exists
    // WITHIN each shard only: each shard reproduces the 1x anchor set
    // exactly and the 10x total must be 10x the 1x total (slack for
    // 60-bit gram-hash collision noise across shards)
    def anchors(df: org.apache.spark.sql.DataFrame): Long =
      CorpusOps.dupSubstringSpans(df, n = 8)
        .agg(sum("n_anchors")).head.getLong(0)
    val a1 = anchors(d1)
    val a10 = anchors(d10)
    assert(a1 > 0, "degenerate fixture: no duplicated anchors at 1x")
    assert(a10 <= 10 * a1 + math.max(10L, a1 / 10),
      s"ExactSubstr anchors superlinear: $a1 at 1x vs $a10 at 10x — cross-shard gram leakage")
    assert(a10 >= 10 * a1 - math.max(10L, a1 / 10),
      s"ExactSubstr anchors sublinear: $a1 at 1x vs $a10 at 10x — replica lost duplication structure")
  }

  test("dedup CC rounds are scale-stable under 10x corpus replication") {
    // pointer jumping converges in O(log diameter); replication adds
    // shards, not diameter, so at most one round of slack
    def roundsOf(df: org.apache.spark.sql.DataFrame): Int = {
      val pairs = TextOps.minhashLshPairs(df, numHashes = 64, bands = 16, threshold = 0.95)
      TextOps.dedupClustersWithRounds(df, pairs)._2
    }
    val r1 = roundsOf(d1)
    val r10 = roundsOf(d10)
    assert(r1 >= 2 && r10 >= 2, s"degenerate round counts $r1/$r10")
    assert(r10 <= r1 + 1,
      s"CC rounds grew with corpus size: 1x=$r1, 10x=$r10 — rounds must track diameter, not n")
  }

  test("hash-quotient join input is class-bounded under 10x member duplication") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    // duplication blow-up — the dedup-corpus model (NOT corpus
    // growth): 10 copies of the same video content under distinct
    // ids. The banded pair join's INPUT (distinct (frame, hash)
    // classes) must not grow at all, while the qualifying-pair
    // OUTPUT grows quadratically because it IS the answer — this is
    // the invariant behind the r16 81s -> 24.5s pair-build rewrite.
    val vids = (0L until 5L).map(_ * 3 + 2)
    def pool(copies: Int) = (0 until copies).flatMap { c =>
      vids.flatMap { id =>
        (0 until 3).map(f =>
          (id + c * 1000000L, f.toLong, Multimodal.syntheticPngFrame(id, f)))
      }
    }.toDF("doc_id", "frame_idx", "payload")
    def classes(df: org.apache.spark.sql.DataFrame): Long =
      Multimodal.frameHashes(df).select(col("frame_idx"), col("fp"))
        .distinct().count()
    val c1 = classes(pool(1))
    val c10 = classes(pool(10))
    assert(c1 > 0 && c10 == c1,
      s"distinct hash classes grew with member duplication: $c1 -> $c10")
    // output mass: every copy of a video matches every other copy on
    // all 3 frames — exactly C(10,1 per-id pairs) * ... = per id,
    // C(10,2)=45 pairs, 5 ids -> 225 qualifying pairs at least
    val p10 = Multimodal.videoNearDupPairs(
      Multimodal.frameHashes(pool(10)), maxHamming = 0).count()
    assert(p10 >= 5 * 45,
      s"duplication clique mass missing from the pair output: $p10")
    // same invariant for the flat-signature quotient core: distinct
    // phashes bound the dedupClustersByHamming join, members do not
    val imgs1 = vids.map(id => Multimodal.MediaRow(id, "image", Multimodal.syntheticPng(id)))
    val imgs10 = (0 until 10).flatMap(c => vids.map(id =>
      Multimodal.MediaRow(id + c * 1000000L, "image", Multimodal.syntheticPng(id))))
    val s1 = Multimodal.imageHashes(spark.createDataset(imgs1)).select("dhash").distinct().count()
    val s10 = Multimodal.imageHashes(spark.createDataset(imgs10)).select("dhash").distinct().count()
    assert(s10 == s1, s"distinct phash classes grew under duplication: $s1 -> $s10")
    // and the quotient clustering still labels every member with the
    // clique minimum
    val labels = TextOps.dedupClustersByHamming(
      spark.createDataset(imgs10).toDF().select(col("doc_id")),
      Multimodal.imageHashes(spark.createDataset(imgs10)),
      sigBits = 64, maxHamming = 0)
      .as[(Long, Long)].collect().toMap
    for (id <- vids; c <- 1 until 10)
      assert(labels(id + c * 1000000L) == id,
        s"copy of $id not labeled with its clique minimum")
  }

  test("kNN graph work metrics are k-bounded under 10x embedding replication") {
    // the graph family's per-round work is the edge list (every edge
    // votes once per LPA round, every edge is touched once per peel
    // round); annTopK caps candidates at k per query, so the
    // symmetrized edge list is <= 2k per node BY CONSTRUCTION — the
    // scale-free sparsity guarantee that makes the Pregel-as-join
    // rounds linear in corpus size. Pinned at 1x and 10x.
    val e1 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val e10 = graft.ScaleData.replicateEmbeddings(e1, 10)
    def edgeStats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val ann = graft.vector.VectorOps.annTopK(df, numPlanes = 8, dims = 64, k = 5)
      val sym = ann.select(col("query_id").as("src"), col("cand_id").as("dst"))
        .unionByName(ann.select(col("cand_id").as("src"), col("query_id").as("dst")))
        .distinct().localCheckpoint()
      (sym.count(), sym.select("src").distinct().count())
    }
    val (ed1, n1) = edgeStats(e1)
    val (ed10, n10) = edgeStats(e10)
    assert(ed1 > 0 && ed10 > 0, s"degenerate graphs $ed1/$ed10")
    assert(ed1 <= 2L * 5 * n1, s"1x vote volume $ed1 exceeds 2k per node ($n1 nodes)")
    assert(ed10 <= 2L * 5 * n10, s"10x vote volume $ed10 exceeds 2k per node ($n10 nodes)")
    // per-node volume must not creep with corpus size (hub formation)
    assert(ed10.toDouble / n10 <= ed1.toDouble / n1 * 1.25 + 1,
      s"per-node vote volume grew: 1x ${ed1.toDouble / n1}, 10x ${ed10.toDouble / n10}")
  }

  test("k-core peel depth is scale-stable under 10x embedding replication") {
    // the peel cascade's depth tracks LOCAL density structure (how many
    // waves until nothing is below k), not corpus size; replication
    // adds shards and near-copies, not deeper cascades. The fixed
    // rounds=6 default is valid at any scale precisely because of this.
    def depth(df: org.apache.spark.sql.DataFrame): Long = {
      val ann = graft.vector.VectorOps.annTopK(df, numPlanes = 8, dims = 64, k = 5)
      graft.vector.VectorOps.knnKCore(ann, k = 6, rounds = 12)
        .agg(max(col("removed_round"))).head.getLong(0)
    }
    val e1 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val d1x = depth(e1)
    val d10x = depth(graft.ScaleData.replicateEmbeddings(e1, 10))
    assert(d1x >= 2, s"degenerate peel depth $d1x at 1x")
    assert(d10x <= d1x + 1,
      s"peel depth grew with corpus size: 1x=$d1x, 10x=$d10x — cascade must track density, not n")
  }

  test("tokenizer piece inventory is vocabulary-bounded under 10x corpus replication") {
    // the artifact the BPE/WordPiece family ships (and broadcasts) is
    // the piece inventory; at 100 TB it must stay bounded by
    // (distinct characters + merges), NOT grow with the corpus. The
    // 10x replica mints at most the tag alphabet ('§' + 10 digits) of
    // new characters, so the inventory must grow by at most that
    // plus the fixed merge budget.
    import spark.implicits._
    def chars(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("text")).as[String]
        .flatMap(t => t.codePoints().toArray.filter(_ != ' ').toSeq)
        .distinct().count()
    val p1 = TextOps.wordpiecePieces(d1, merges = 10).length
    val p10 = TextOps.wordpiecePieces(d10, merges = 10).length
    val c1 = chars(d1)
    val c10 = chars(d10)
    assert(p1 >= 2 && p10 >= 2, s"degenerate inventories $p1/$p10")
    assert(p1 <= c1 + 10, s"1x inventory $p1 exceeds chars+merges ${c1 + 10}")
    assert(p10 <= c10 + 10, s"10x inventory $p10 exceeds chars+merges ${c10 + 10}")
    assert(c10 - c1 <= 11,
      s"replica minted ${c10 - c1} new characters — more than the tag alphabet")
  }

  test("unigram piece table is seed-bounded and coverage-complete under 10x replication") {
    // the unigram artifact is (alphabet + <= seedMulti) pieces BY
    // CONSTRUCTION — the broadcastable-tokenizer contract that makes
    // every EM round one flatMap over the distinct words at 100 TB.
    // Coverage: every single character survives every round (the +1
    // floor), so every distinct word of the 10x corpus must segment
    // without the kernel's loud coverage guard firing, and reassemble
    // to itself.
    import spark.implicits._
    def charsOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("text")).as[String]
        .flatMap(t => t.codePoints().toArray.filter(_ != ' ').toSeq)
        .distinct().count()
    def vocabSize(df: org.apache.spark.sql.DataFrame): (Long, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val (vocab, words) = UnigramOps.unigramArtifacts(
        df, maxPieceLen = 4, seedMulti = 32, iters = 2)
      (vocab.count(), vocab, words)
    }
    val (v1, _, _) = vocabSize(d1)
    val (v10, vocab10, words10) = vocabSize(d10)
    val c1 = charsOf(d1); val c10 = charsOf(d10)
    assert(v1 >= 2 && v10 >= 2, s"degenerate piece tables $v1/$v10")
    assert(v1 <= c1 + 32, s"1x piece table $v1 exceeds chars+seedMulti ${c1 + 32}")
    assert(v10 <= c10 + 32, s"10x piece table $v10 exceeds chars+seedMulti ${c10 + 32}")
    // coverage at 10x: every distinct word segments and reassembles
    val segs = UnigramOps.unigramSegmentsFromVocab(words10, vocab10, maxPieceLen = 4)
      .select(col("w"), col("seg")).as[(String, String)].collect()
    assert(segs.nonEmpty)
    segs.foreach { case (w, s) =>
      assert(s.split(" ").mkString === w, s"word $w reassembled as $s")
    }
  }

  test("BFS seed fraction and per-round frontier stay probe-bounded under 10x replication") {
    // the md5 seed predicate selects a constant 1/16 FRACTION of the
    // nodes, so the round-0 row and every frontier (bounded by
    // reachable nodes <= n) scale with the graph, never a fixed cap —
    // the blast-radius histogram is an operator measurement at any
    // corpus size. Rounds are the bounded maxDepth by construction.
    val e1 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val e10 = graft.ScaleData.replicateEmbeddings(e1, 10)
    def stats(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val ann = graft.vector.VectorOps.annTopK(df, numPlanes = 8, dims = 64, k = 5)
      val out = graft.vector.VectorOps.knnBfsDepths(ann, maxDepth = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val nodes = ann.select(col("query_id").as("node")).unionByName(
        ann.select(col("cand_id").as("node"))).distinct().count()
      (out.filter(_._1 == 0L).map(_._2).sum, out.map(_._2).sum, nodes)
    }
    val (s1, r1, n1) = stats(e1)
    val (s10, r10, n10) = stats(e10)
    assert(s1 > 0 && s10 > 0, s"degenerate seed sets $s1/$s10")
    // seed counts track the md5 fraction of the node population
    assert(math.abs(s10.toDouble / n10 - s1.toDouble / n1) < 0.05,
      s"seed fraction drifted: 1x ${s1.toDouble / n1}, 10x ${s10.toDouble / n10}")
    // reached mass is node-bounded and grows with the graph
    assert(r10 <= n10 && r10 >= 5 * r1,
      s"reach did not scale with the graph: $r1/$n1 at 1x, $r10/$n10 at 10x")
  }

  test("layout/batching/bootstrap outputs are configuration-sized at both scales") {
    // the three round-12 report operators return CONFIGURATION-sized
    // results (files, strategies, one CI row) no matter the corpus —
    // the driver-collect story is structurally safe at 100 TB, and the
    // z-order equal-split balance (±1 row via pos*F div n) holds at
    // both scales.
    val li1 = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val li10 = this.li10
    for (li <- Seq(li1, li10)) {
      val z = OrderOps.zorderLayoutStats(li, col("l_partkey"), col("l_suppkey"),
        col("l_orderkey") * 100 + col("l_linenumber"), files = 8, bits = 16)
        .collect()
      assert(z.length == 16, s"expected 2 layouts x 8 files, got ${z.length}")
      val n = li.count()
      val sizes = z.filter(_.getString(0) == "zorder").map(_.getLong(2))
      assert(sizes.sum == n)
      assert(sizes.max - sizes.min <= 1,
        s"equal-split violated: ${sizes.mkString(",")}")
    }
    val d10x = graft.ScaleData.replicateDocuments(d1, 10)
    assert(CorpusOps.bootstrapMeanCi(d1).count() == 1L)
    assert(CorpusOps.bootstrapMeanCi(d10x).count() == 1L)
    val pw = OrderOps.padWasteReport(d10x, capacity = 256, batchSize = 8).collect()
    assert(pw.length == 3)
    // packed is the lower bound: no strategy beats it
    val padded = pw.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(padded("packed") <= padded("naive") && padded("packed") <= padded("sorted"))
    assert(padded("sorted") <= padded("naive"),
      "length-bucketing must not pad more than naive batching")
  }

  test("round-12 state shapes are corpus-size-free at both scales") {
    // sketch store: the READ-side state is sources x <= 256 register
    // rows no matter how much corpus was sketched — the property that
    // lets a 100 TB history answer from kilobytes
    val d10x = graft.ScaleData.replicateDocuments(d1, 10)
    for (d <- Seq(d1, d10x)) {
      val store = java.nio.file.Files.createTempDirectory("graft-sc-sk").toString
      graft.io.SketchIO.writeSketch(d, store, n = 3)
      val m = graft.io.SketchIO.mergedRegisters(spark, store)
      val perSource = m.groupBy("source").count().collect().map(_.getLong(1))
      assert(perSource.nonEmpty && perSource.forall(_ <= 256L),
        s"register table outgrew 256/source: max ${perSource.max}")
    }
    // equi-depth histogram: depths are floor/ceil(n/B) BY CONSTRUCTION
    // at any corpus size — the rank-range definition, not data luck
    for (d <- Seq(d1, d10x)) {
      val n = d.count()
      val h = OrderOps.equiDepthHistogram(d, "n_chars", "doc_id", buckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      assert(h.length == 8)
      val (lo, hi) = (n / 8, n / 8 + (if (n % 8 == 0) 0 else 1))
      assert(h.forall { case (_, c) => c == lo || c == hi },
        s"equi-depth violated at n=$n: ${h.mkString(",")}")
    }
    // mv maintenance: the merge's inputs are AGGREGATE-sized (distinct
    // key combinations), never corpus-sized, at both scales
    val li1 = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val li10 = this.li10
    for (li <- Seq(li1, li10)) {
      val st = graft.rel.RelOps.distributiveAgg(
        li, Seq("l_returnflag", "l_linestatus"), "l_quantity")
      assert(st.count() <= 9L, "aggregate state outgrew the key domain")
    }
  }
}
