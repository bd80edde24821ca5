package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Corpus-statistics (contamination, bigram LM, tf-idf) and global-
  * order (packing, shuffle) operators: hand-computed expectations on
  * tiny corpora, plus the partition-independence properties that make
  * the prefix-sum operators safe at cluster scale.
  */
class CorpusOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bm25 scores match a hand-rolled scorer and rank by rounded score") {
    val d = docsDf(
      0L -> "spark join join window",       // tf(join)=2, dl=4
      1L -> "spark filter sort merge scan", // dl=5
      2L -> "sort scan batch group",        // no query terms -> absent
      3L -> "join")                         // dl=1
    val q = Seq("spark", "join")
    val out = CorpusOps.bm25TopK(d, q, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent scorer: same formula, plain Scala
    val toks = Map(0L -> Seq("spark", "join", "join", "window"),
      1L -> Seq("spark", "filter", "sort", "merge", "scan"),
      2L -> Seq("sort", "scan", "batch", "group"), 3L -> Seq("join"))
    val n = 4.0
    val avgdl = toks.values.map(_.size).sum.toDouble / 4.0
    val dfq = q.map(t => t -> toks.values.count(_.contains(t))).toMap
    def score(id: Long): Double = {
      val s = q.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log((n - dfq(t) + 0.5) / (dfq(t) + 0.5) + 1.0) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks(id).size / avgdl))
      }.sum
      math.rint(s * 1e6) / 1e6
    }
    assert(out.keySet == Set(0L, 1L, 3L), "doc 2 has no query term")
    for (id <- out.keySet)
      assert(math.abs(out(id) - score(id)) < 1e-9, s"doc $id: ${out(id)} vs ${score(id)}")
  }

  test("temperature mixing weights: p_temp sums to 1, flattening boosts the tail, alpha=1 is identity") {
    val d = Seq.tabulate(40)(i =>
      (i.toLong, if (i < 36) "w " * 20 + "w" else "w", if (i < 36) "head" else "tail"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.temperatureMixWeights(d, alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val (_, _, pRawH, pTempH, boostH) = out("head")
    val (_, _, pRawT, pTempT, boostT) = out("tail")
    assert(math.abs(pTempH + pTempT - 1.0) < 1e-5)
    assert(pRawT < 0.01 && pTempT > pRawT && boostT > 1.0, "tail up-sampled")
    assert(pTempH < pRawH && boostH < 1.0, "head down-sampled")
    val id = TextOps.temperatureMixWeights(d, alpha = 1.0)
      .collect().map(r => r.getDouble(5))
    assert(id.forall(b => math.abs(b - 1.0) < 1e-6), "alpha=1 keeps the natural rates")
  }

  test("cross-corpus novelty: fully-seen docs score 0, disjoint docs 1, mixed the exact fraction") {
    val base = docsDf(0L -> "a b c d e")      // grams: "a b c","b c d","c d e"
    val inc = docsDf(
      1L -> "a b c d e",                      // all 3 grams in base -> 0
      2L -> "x y z w",                        // 2 grams, none seen -> 1
      3L -> "a b c q r s",                    // 4 grams, 1 seen -> 0.75
      4L -> "a b")                            // too short: absent
    val out = TextOps.crossCorpusNovelty(base, inc, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      1L -> ((3L, 3L, 0.0)), 2L -> ((2L, 0L, 1.0)), 3L -> ((4L, 1L, 0.75))))
  }

  test("rrf fusion sums 1/(k0+rank) across lists and ranks by rounded fused score") {
    // list A ranks: 10, 20, 30; list B ranks: 20, 30, 40
    val a = Seq((10L, 3.0), (20L, 2.0), (30L, 1.0)).toDF("doc_id", "score")
    val b = Seq((20L, 9.0), (30L, 8.0), (40L, 7.0)).toDF("doc_id", "score")
    val out = CorpusOps.rrfFuse(Seq(a, b), k0 = 60, k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def rrf(rs: Int*) = math.rint(rs.map(r => 1.0 / (60 + r)).sum * 1e6) / 1e6
    assert(out == Map(
      10L -> ((1L, rrf(1))), 20L -> ((2L, rrf(2, 1))),
      30L -> ((2L, rrf(3, 2))), 40L -> ((1L, rrf(3)))))
    // doc 20 (rank 2 + rank 1) must out-score doc 10 (rank 1 alone)
    assert(out(20L)._2 > out(10L)._2)
  }

  test("keepBestPerCluster keeps the argmax-quality member, ties to min id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 10L), (2L, 99L), (3L, 50L), (4L, 7L), (5L, 7L), (6L, 1L))
      .toDF("doc_id", "quality")
    val out = TextOps.keepBestPerCluster(clusters, quality)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 99L, 3L)),  // best quality wins over min id
      4L -> ((4L, 7L, 2L)),   // quality tie -> min id
      6L -> ((6L, 1L, 1L))))  // singleton keeps itself
  }

  test("hashed classifier margin equals the JVM-hash recomputation; empty doc scores 0") {
    val d = Seq((0L, "alpha beta gamma delta"), (1L, "alpha alpha alpha"), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.hashedClassifierScore(d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def margin(ws: Seq[String]): (Long, Double) = {
      val s = ws.map(w => TextOps.tokenHashJvm(md, w) % 1001 - 500).sum
      (s, math.rint(s / (500.0 * ws.size) * 1e6) / 1e6)
    }
    val (s0, m0) = margin(Seq("alpha", "beta", "gamma", "delta"))
    val (s1, m1) = margin(Seq("alpha", "alpha", "alpha"))
    assert(out(0L) == ((4L, s0, m0, s0 > 0)))
    assert(out(1L) == ((3L, s1, m1, s1 > 0)))
    assert(out(2L) == ((0L, 0L, 0.0, false)))
  }

  test("token fertility counts subword fragmentation per stratum") {
    val d = Seq(
      (0L, "hello world", "a"),        // ws 2, bpe 2, ch 11
      (1L, "don't stop-now", "a"),     // ws 2, bpe: don ' t stop - now = 6, ch 14
      (2L, "x2y", "b"))                // ws 1, bpe: x 2 y = 3, ch 3
      .toDF("doc_id", "text", "source")
    val out = TextOps.tokenFertility(d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("a") == ((2L, 4L, 8L, 2.0, math.rint(25.0 / 8 * 1e6) / 1e6)))
    assert(out("b") == ((1L, 1L, 3L, 3.0, 1.0)))
  }

  // ---- contamination ----

  test("contamination counts distinct shared n-grams against the eval set") {
    val d = docsDf(
      0L -> "a b c d e f",      // eval doc: grams "a b c", "b c d", "c d e", "d e f"
      1L -> "a b c x y z",      // shares "a b c" -> 1 of 4 grams
      2L -> "c d e f g h i",    // shares "c d e", "d e f" -> 2 of 5
      3L -> "p q r s t",        // shares none -> 0 of 3
      4L -> "x y")              // too short: 0 grams
    val out = CorpusOps.contamination(d, d.filter(col("doc_id") === 0), n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((4L, 4L, 1.0)))  // the eval doc itself is fully contaminated
    assert(out(1L) == ((4L, 1L, 0.25)))
    assert(out(2L) == ((5L, 2L, 0.4)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))  // no grams -> ratio 0, not NaN
  }

  test("contamination counts DISTINCT grams once however often they repeat") {
    val d = docsDf(0L -> "a b c", 1L -> "a b c a b c a b c")
    // doc 1 grams: "a b c","b c a","c a b" x
    val out = CorpusOps.contamination(d, d.filter(col("doc_id") === 0), n = 3)
      .filter(col("doc_id") === 1).head()
    assert(out.getLong(1) == 3L) // distinct grams
    assert(out.getLong(2) == 1L) // only "a b c" is shared, counted once
  }

  // ---- bigram LM ----

  test("bigram LM score matches a sequential reference model") {
    val rows = Seq(0L -> "a b a b", 1L -> "a b", 2L -> "z z z", 3L -> "a")
    val d = docsDf(rows: _*)
    // sequential reference: counts over (<s> prepended) bigram stream
    val streams = rows.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      id -> ("<s>" +: ws.dropRight(1)).zip(ws)
    }
    val all = streams.flatMap(_._2)
    val c2 = all.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = all.groupBy(_._1).map { case (k, v) => k -> v.size }
    val vocab = all.map(_._2).distinct.size
    val want = streams.map { case (id, bgs) =>
      val lps = bgs.map { bg => math.log((c2(bg) + 1.0) / (c1(bg._1) + vocab)) }
      id -> ((bgs.size.toLong, math.rint(lps.sum / lps.size * 1e6) / 1e6))
    }.toMap
    val got = CorpusOps.bigramLmScore(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    for ((id, (n, score)) <- want) {
      assert(got(id)._1 == n, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - score) < 1e-9, s"doc $id score: got ${got(id)._2} want $score")
    }
  }

  test("held-out LM scoring: unseen bigrams and unseen contexts get the smoothed mass") {
    // train "a b a b": c2 = {(<s>,a):1, (a,b):2, (b,a):1},
    // c1 = {<s>:1, a:2, b:1}, V = |{a,b}| = 2
    val train = docsDf(0L -> "a b a b")
    val eval_ = docsDf(
      1L -> "a b z",  // (b,z) unseen bigram, seen context b
      2L -> "q q")    // (<s>,q) unseen bigram; (q,q) unseen CONTEXT too
    val got = CorpusOps.bigramLmScoreHeldOut(train, eval_)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val s1 = (math.log(2.0 / 3) + math.log(3.0 / 4) + math.log(1.0 / 3)) / 3
    val s2 = (math.log(1.0 / 3) + math.log(1.0 / 2)) / 2
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - math.rint(s1 * 1e6) / 1e6) < 1e-9)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 - math.rint(s2 * 1e6) / 1e6) < 1e-9)
  }

  test("Kneser-Ney held-out scoring: discount, continuation interpolation, unseen cases exact") {
    // train "a b a c": c2 = {(<s>,a):1, (a,b):1, (b,a):1, (a,c):1}
    // ctx: <s>:(1,1) a:(2,2) b:(1,1); cont: a:2 b:1 c:1; T=4 V=3
    // Pc(w) = (n1r+1)/8 -> a:3/8 b:1/4 c:1/4 z:1/8
    val train = docsDf(0L -> "a b a c")
    val eval_ = docsDf(1L -> "a b", 2L -> "z z")
    val got = CorpusOps.bigramLmScoreKneserNey(train, eval_)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // (<s>,a): (max(1-.75,0) + .75*1*(3/8))/1 = .53125
    // (a,b):   (.25 + .75*2*.25)/2 = .3125
    val k1 = (math.log(0.53125) + math.log(0.3125)) / 2
    // (<s>,z): unseen bigram, seen ctx: (0 + .75*1*(1/8))/1 = .09375
    // (z,z):   unseen CONTEXT -> Pc(z) = 1/8
    val k2 = (math.log(0.09375) + math.log(0.125)) / 2
    assert(got(1L)._1 == 2L && math.abs(got(1L)._2 - math.rint(k1 * 1e6) / 1e6) < 1e-9)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 - math.rint(k2 * 1e6) / 1e6) < 1e-9)
    // probability-mass sanity: for the seen context 'a',
    // sum over the train vocabulary stays below 1 (the discount's
    // freed mass is only partially re-spent on the vocab)
    val pA = 0.28125; val pB = 0.3125; val pC = 0.3125
    assert(pA + pB + pC <= 1.0)
  }

  test("repetitive text scores higher than novel text under its own corpus LM") {
    val d = docsDf(0L -> "a a a a a a a a", 1L -> "q w e r t y u i")
    val got = CorpusOps.bigramLmScore(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(0L) > got(1L)) // "a a" bigrams dominate the model
  }

  // ---- tf-idf ----

  test("tf-idf ranks corpus-rare high-tf terms first, ties broken by term") {
    val d = docsDf(
      0L -> "rare rare common",
      1L -> "common other",
      2L -> "common other")
    val out = CorpusOps.tfIdfTopTerms(d, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toList
    // doc 0: "rare" (tf=2, df=1) beats "common" (tf=1, df=3, idf=0)
    assert(out.contains((0L, "rare", 1L)))
    // docs 1/2: "other" (df=2) beats "common" (idf = ln(1) = 0)
    assert(out.contains((1L, "other", 1L)) && out.contains((2L, "other", 1L)))
    // k cap respected
    assert(out.count(_._1 == 0L) == 2)
  }

  test("tf-idf rank is at most k and scores are rounded before ranking") {
    val d = docsDf(0L -> "a b c d e f g h")
    val out = CorpusOps.tfIdfTopTerms(d, k = 3).collect()
    assert(out.length == 3)
    // single doc: every term has idf = ln(1) = 0 -> all scores 0.0,
    // ranking must fall back to term order deterministically
    assert(out.map(_.getString(1)).toList == List("a", "b", "c"))
  }

  test("winnowPairs finds overlapping docs and the df cap kills corpus-wide grams") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val d = docsDf(
      0L -> (shared + " tail zero"),
      1L -> (shared + " tail one!!"),   // long shared prefix with 0
      2L -> "completely different content with no overlap whatsoever here")
    val pairs = TextOps.winnowPairs(d, k = 8, w = 4, minShared = 3, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) >= 3)
    assert(!pairs.keys.exists { case (a, b) => a == 2L || b == 2L })
    // a df cap of 1 removes every shared fingerprint -> no pairs at all
    assert(TextOps.winnowPairs(d, 8, 4, 1, maxDf = 1).collect().isEmpty)
  }

  test("compressionRatio separates repetitive from varied text, deterministically") {
    val rep = Seq.fill(60)("spam").mkString(" ")
    val varied = (0 until 60).map(i => s"tok${i * 7919 % 997}x${i}").mkString(" ")
    val d = docsDf(0L -> rep, 1L -> varied, 2L -> "")
    val out = TextOps.compressionRatio(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L)._3 < out(1L)._3) // repetition compresses better
    assert(out(0L)._3 > 0.0 && out(1L)._3 < 1.5)
    assert(out(2L) == ((0L, out(2L)._2, 0.0))) // empty doc: ratio 0, no NaN
    assert(out(0L)._1 == rep.getBytes("UTF-8").length.toLong)
    // deterministic across partitionings (one Deflater per task)
    val rep2 = TextOps.compressionRatio(d.repartition(3))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rep2 == out.view.mapValues(_._3).toMap)
  }

  test("simhashPairs banding equals the exhaustive Hamming join for several radii") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = TextOps.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1))
    // radii that divide 60 unevenly exercise the remainder band
    for (r <- Seq(2, 3, 6, 7)) {
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= r
      } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
      val got = TextOps.simhashPairs(docs, maxHamming = r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(got == want, s"radius $r: got ${got.size} want ${want.size}")
    }
  }

  test("winnow-verified pairs are SOUND: a subset of the exhaustive ngram join with exact sims") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cand = TextOps.winnowPairs(docs, k = 8, w = 4, minShared = 3, maxDf = 50)
    val verified = TextOps.verifyPairsNgramJaccard(docs, cand, n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exhaustive = TextOps.ngramJaccardPairs(docs, 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // soundness: every verified pair is in the exhaustive join with the
    // SAME exact similarity (never an approximation)
    for ((pair, j) <- verified) {
      assert(exhaustive.contains(pair), s"unsound pair $pair")
      assert(exhaustive(pair) == j, s"sim mismatch for $pair: $j vs ${exhaustive(pair)}")
    }
    assert(verified.keySet.subsetOf(exhaustive.keySet))
  }

  test("verifyPairsNgramJaccard: duplicate candidate rows do not inflate the similarity") {
    // a generator that emits the same (id_a, id_b) more than once (e.g.
    // multi-table LSH before dedup) must yield the same exact jaccard
    // as a single candidate row — the pre-fix code multiplied `inter`
    // per duplicate, pushing jaccard past 1 and past any threshold
    val docs = docsDf(
      0L -> "the quick brown fox jumps over the lazy dog today",
      1L -> "the quick brown fox jumps over the lazy dog tonight")
    val once = Seq((0L, 1L)).toDF("id_a", "id_b")
    val tripled = Seq((0L, 1L), (0L, 1L), (0L, 1L)).toDF("id_a", "id_b")
    def run(c: org.apache.spark.sql.DataFrame) =
      TextOps.verifyPairsNgramJaccard(docs, c, n = 3, threshold = 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val a = run(once); val b = run(tripled)
    assert(a == b, s"duplicated candidates changed the result: $a vs $b")
    assert(a.values.forall(j => j > 0.0 && j <= 1.0))
  }

  test("decontaminate: NULL text behaves as empty text, identically to the oracle's NOT IN") {
    val train = Seq(
      (0L, Some("alpha beta")), (1L, None: Option[String]), (2L, Some("")))
      .toDF("doc_id", "text")
    // eval contains the empty string -> NULL-text and empty-text train
    // rows BOTH drop (NULL ≡ empty, pinned by the coalesce)
    val evalWithEmpty = Seq((100L, Some(""))).toDF("doc_id", "text")
    val kept1 = CorpusOps.decontaminate(train, evalWithEmpty)
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(0L))
    // eval without empty/NULL -> NULL-text train row is KEPT (defined,
    // not accidentally kept by a never-true NULL join key)
    val evalOther = Seq((100L, Some("alpha beta"))).toDF("doc_id", "text")
    val kept2 = CorpusOps.decontaminate(train, evalOther)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 2L))
  }

  test("tokenBudgetPerStratum: budget fills in hash order, boundary doc included, strata independent") {
    val d = Seq(
      (0L, "sA", "a b c d"),        // 4 tokens each
      (1L, "sA", "a b c d"),
      (2L, "sA", "a b c d"),
      (3L, "sB", "x y"))            // other stratum: own budget
      .toDF("doc_id", "source", "text")
    // budget 6: first doc (4 tokens) enters with prior 0 < 6; second
    // enters with prior 4 < 6 (BOUNDARY doc -> cum 8 > budget); third
    // is cut (prior 8 >= 6)
    val out = CorpusOps.tokenBudgetPerStratum(d, budget = 6, salt = "s1")
      .collect().map(r => r.getLong(1) -> ((r.getString(0), r.getLong(2), r.getLong(3)))).toMap
    val aRows = out.filter(_._2._1 == "sA")
    assert(aRows.size == 2, s"budget kept ${aRows.size} of sA")
    assert(aRows.values.map(_._3).toSet == Set(4L, 8L)) // running sums
    assert(out.contains(3L) && out(3L) == (("sB", 2L, 2L)))
    // order is the salted hash, not doc_id: a different salt can pick
    // a different boundary pair (deterministic per salt either way)
    val again = CorpusOps.tokenBudgetPerStratum(d, budget = 6, salt = "s1")
      .collect().map(_.getLong(1)).toSet
    assert(again == out.keySet)
  }

  test("tokenWaterfill: hand-computed cut and level; all-capped when the budget covers everything") {
    // tokens a=10, b=100, c=1000; maxEpochs 2 -> caps 20, 200, 2000;
    // budget = 1110 div 2 = 555. Cut m=2 (P_2=220, +1*200 <= 555),
    // lambda = (555-220)/1 = 335 -> allocs 20, 200, 335
    val d = Seq(
      ("a", ("t " * 10).trim), ("b", ("t " * 100).trim), ("c", ("t " * 1000).trim))
      .map { case (s, t) => (s.hashCode.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.tokenWaterfill(d, maxEpochs = 2L,
        budgetNumer = 1L, budgetDenom = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((10L, 20L, 20L, 2000L)), s"a: ${out("a")}")
    assert(out("b") == ((100L, 200L, 200L, 2000L)), s"b: ${out("b")}")
    assert(out("c") == ((1000L, 2000L, 335L, 335L)), s"c: ${out("c")}")
    // budget >= total caps: every source fully allocated at its cap
    val full = CorpusOps.tokenWaterfill(d, maxEpochs = 2L,
        budgetNumer = 3L, budgetDenom = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(full == Map("a" -> 20L, "b" -> 200L, "c" -> 2000L), s"full: $full")
    // the face emits in source order from one pinned partition
    val srcs = CorpusOps.tokenWaterfill(d).collect().map(_.getString(0)).toSeq
    assert(srcs == srcs.sorted)
  }

  test("ksLengthDrift: hand-computed sup of the integer CDF cross-multiply; identical groups read 0") {
    // A lengths {1,2}, B lengths {2,4}: at v=1 |1*2-0*2|=2, v=2
    // |2*2-1*2|=2, v=4 0 -> D_num=2 over n*m=4 -> KS=0.5 = 500000 ppm
    def doc(src: String, id: Long, n: Int) = (id, src, ("w " * n).trim)
    val d = Seq(doc("A", 0, 1), doc("A", 1, 2), doc("B", 2, 2), doc("B", 3, 4))
      .toDF("doc_id", "source", "text")
    val r = CorpusOps.ksLengthDrift(d, "A", "B").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 2L, 500000L)), s"ks face: $r")
    // a group compared against an identically-distributed twin reads 0
    val same = Seq(doc("A", 0, 3), doc("A", 1, 5), doc("B", 2, 3), doc("B", 3, 5))
      .toDF("doc_id", "source", "text")
    val z = CorpusOps.ksLengthDrift(same, "A", "B").collect().head
    assert(z.getLong(2) == 0L && z.getLong(3) == 0L, s"identical: $z")
    // disjoint supports read the maximum statistic (1.0 = 1e6 ppm)
    val far = Seq(doc("A", 0, 1), doc("A", 1, 2), doc("B", 2, 9), doc("B", 3, 9))
      .toDF("doc_id", "source", "text")
    val f = CorpusOps.ksLengthDrift(far, "A", "B").collect().head
    assert(f.getLong(3) == 1000000L, s"disjoint: $f")
  }

  test("tokenBudgetPerStratum: a NULL stratum spanning partitions keeps ONE running budget") {
    // regression: the two-pass emit used curK = null as its first-row
    // sentinel, so a null stratum's rows in partitions after the first
    // compared equal to the sentinel, skipped their broadcast offset,
    // and re-filled the budget once per partition
    val n = 400 // spreads across all range partitions
    val d = (0L until n).map(i => (i, null: String, "t1 t2 t3")).toDF("doc_id", "source", "text")
    val out = CorpusOps.tokenBudgetPerStratum(d, budget = 30, salt = "s2")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // 3 tokens/doc, budget 30 -> exactly 10 docs, cum 3,6,...,30; a
    // per-partition budget restart would emit ~10 docs PER partition
    assert(out.length == 10, s"null stratum emitted ${out.length} docs")
    assert(out.map(_._2).sorted.toSeq == (1 to 10).map(_ * 3L))
    // the selected ids are the 10 smallest salted hashes — independent
    // of partitioning, so recompute the expectation locally
    val md = java.security.MessageDigest.getInstance("MD5")
    def saltedHash(id: Long): Long = {
      md.reset()
      val hex = md.digest(s"s2:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = (0L until n).sortBy(i => (saltedHash(i), i)).take(10).toSet
    assert(out.map(_._1).toSet == expect)
  }

  test("lengthPercentileCut keeps null-stratum docs under their own cutoff") {
    // NULL stratum keys form their own percentile group (the same
    // contract tokenBudgetPerStratum honors); a plain equi-join on the
    // stratum would silently drop every null-stratum document
    val d = Seq(
      (0L, null: String, 10L), (1L, null: String, 20L),
      (2L, null: String, 30L), (3L, null: String, 40L),
      (4L, "en", 5L), (5L, "en", 50L))
      .toDF("doc_id", "lang", "n_chars")
    val kept = CorpusOps.lengthPercentileCut(d, p = 0.5)
      .collect().map(_.getLong(0)).toSet
    // null stratum: median of (10,20,30,40) = 25 -> keep 30, 40;
    // "en": median of (5,50) = 27.5 -> keep 50
    assert(kept == Set(2L, 3L, 5L), s"$kept")
  }

  test("decontaminateBloom is bit-identical to exact decontaminate, false positives included") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val eval_ = docs.filter(col("doc_id") % 10 === 0)
    val exact = CorpusOps.decontaminate(docs, eval_)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // fpp 0.5 makes Bloom false positives near-certain at this corpus
    // size — the exact-verify stage must scrub every one of them
    for (fpp <- Seq(0.5, 0.01)) {
      val got = CorpusOps.decontaminateBloom(docs, eval_, fpp)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == exact, s"fpp=$fpp: ${got.size} vs ${exact.size}")
    }
    // the count-skipping path (caller-supplied cardinality) is
    // identical, including a deliberately-low estimate (bloom fpp
    // degrades, exactness survives via the verify join)
    for (est <- Seq(1L, 50L, 100000L)) {
      val got = CorpusOps.decontaminateBloom(docs, eval_, 0.01,
          expectedItems = Some(est))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == exact, s"expectedItems=$est: ${got.size} vs ${exact.size}")
    }
    // no cache entry may outlive the call (the leak the persist fix
    // could have introduced)
    assert(spark.sharedState.cacheManager.isEmpty,
      "decontaminateBloom leaked a cached DataFrame")
  }

  test("decontaminate drops exact content matches and keeps everything else") {
    val train = docsDf(0L -> "alpha beta", 1L -> "gamma delta", 2L -> "alpha beta")
    val eval_ = docsDf(100L -> "alpha beta", 101L -> "unrelated")
    val kept = CorpusOps.decontaminate(train, eval_)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L)) // both copies of the contaminated text drop
  }

  // ---- composed selection endpoint ----

  test("selectCorpus applies language, repetition, dedup-keeper, and length stages in order") {
    val good = (0 until 25).map(i => s"w$i").mkString(" ") // 25 distinct tokens
    val d = Seq(
      (0L, "en", good),                       // kept
      (1L, "en", good),                       // exact dup of 0 -> dropped (keeper = min id)
      (2L, "de", good),                       // wrong language
      (3L, "en", Seq.fill(25)("x").mkString(" ")), // top-token ratio 1.0 -> dropped
      (4L, "en", "short text here"))          // 3 tokens < 20 -> dropped
      .toDF("doc_id", "lang", "text")
    val out = CorpusOps.selectCorpus(d, "en", minWords = 20, maxTopTokenRatio = 0.12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 25L))
  }

  // ---- sequence packing ----

  test("packSequences matches a sequential fold, including spanning docs") {
    val d = docsDf(
      0L -> Seq.fill(3)("w").mkString(" "),   // 3 tokens: cum 0..2   -> bin 0
      1L -> Seq.fill(10)("w").mkString(" "),  // cum 3..12 cap 8      -> bins 0..1
      2L -> Seq.fill(8)("w").mkString(" "),   // cum 13..20           -> bins 1..2
      3L -> "",                               // zero tokens at cum 21 -> bin 2..2
      4L -> Seq.fill(4)("w").mkString(" "))   // cum 21..24           -> bins 2..3
    val out = OrderOps.packSequences(d, capacity = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((3L, 0L, 0L)))
    assert(out(1L) == ((10L, 0L, 1L)))
    assert(out(2L) == ((8L, 1L, 2L)))
    assert(out(3L) == ((0L, 2L, 2L)))
    assert(out(4L) == ((4L, 2L, 3L)))
  }

  test("packSequences is independent of input partitioning") {
    val rows = (0L until 97L).map(i => i -> Seq.fill((i % 13 + 1).toInt)("w").mkString(" "))
    val d = docsDf(rows: _*)
    val a = OrderOps.packSequences(d, 32).collect().map(_.toSeq).toSet
    val b = OrderOps.packSequences(d.repartition(7), 32).collect().map(_.toSeq).toSet
    val c = OrderOps.packSequences(d.repartition(1), 32).collect().map(_.toSeq).toSet
    assert(a == b && b == c)
    // and matches the sequential fold
    var cum = 0L
    val want = rows.map { case (id, t) =>
      val n = t.split(" ").count(_.nonEmpty).toLong
      val r = (id, n, cum / 32, (cum + math.max(n, 1) - 1) / 32)
      cum += n
      r
    }.toSet
    assert(a.map(s => (s(0), s(1), s(2), s(3))) == want)
  }

  // ---- deterministic shuffle ----

  test("shuffleOrder is a permutation consistent with the salted-hash sort") {
    val d = docsDf((0L until 50L).map(i => i -> "x"): _*)
    val out = OrderOps.shuffleOrder(d, salt = "s1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSeq.sorted == (0L until 50L))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String =
      md.digest(s"s1:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (0L until 50L).sortBy(key).zipWithIndex.map { case (id, p) => id -> p.toLong }.toMap
    assert(out == want)
  }

  test("shuffleOrder is deterministic and salt-sensitive") {
    val d = docsDf((0L until 40L).map(i => i -> "x"): _*)
    val a = OrderOps.shuffleOrder(d, "s1").collect().map(_.toSeq).toSet
    val b = OrderOps.shuffleOrder(d.repartition(5), "s1").collect().map(_.toSeq).toSet
    val c = OrderOps.shuffleOrder(d, "s2").collect().map(_.toSeq).toSet
    assert(a == b)   // partition-independent
    assert(a != c)   // salt changes the order
  }

  // ---- empty-input edges ----

  test("prefix-sum operators and contamination handle empty inputs") {
    val empty = docsDf()
    assert(OrderOps.packSequences(empty, 8).collect().isEmpty)
    assert(OrderOps.shuffleOrder(empty).collect().isEmpty)
    val d = docsDf(0L -> "a b c d e")
    // empty eval set: zero hits, ratio 0 for every doc
    val out = CorpusOps.contamination(d, empty, n = 3).head()
    assert(out.getLong(1) == 3L && out.getLong(2) == 0L && out.getDouble(3) == 0.0)
  }

  // ---- shard sink ----

  test("writeShards emits contiguous equal-ish ordered shards that reassemble the corpus") {
    val d = docsDf((0L until 100L).map(i => i -> s"doc $i"): _*)
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    OrderOps.writeShards(d, out, numShards = 4, salt = "sh1")
    // partition directories exist
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toList == List("shard=0", "shard=1", "shard=2", "shard=3"))
    val back = spark.read.parquet(out)
    assert(back.count() == 100)
    // every id present exactly once; shard matches the formula over the
    // deterministic order; per-shard pos ranges are contiguous slices
    val rows = back.select(col("doc_id"), col("pos"), col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.map(_._1).sorted.toList == (0L until 100L).toList)
    val order = OrderOps.shuffleOrder(d, "sh1").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, pos, shard) =>
      assert(order(id) == pos)
      assert(shard == pos * 4 / 100)
    }
    val byShard = rows.groupBy(_._3).view.mapValues(_.map(_._2).sorted).toMap
    assert(byShard.keySet == Set(0, 1, 2, 3))
    for ((s, ps) <- byShard) assert(ps.toList == (ps.min to ps.max).toList && ps.length == 25)
  }

  test("reliable=true routes through checkpoint() and matches the localCheckpoint results") {
    val sc = spark.sparkContext
    val prior = sc.getCheckpointDir
    // without a checkpoint dir the reliable path must fail LOUDLY
    // before running anything (Spark's own error fires mid-job)
    if (prior.isEmpty)
      intercept[IllegalArgumentException] {
        OrderOps.shuffleOrder(docsDf(0L -> "a"), reliable = true)
      }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      val d = docsDf((0L until 50L).map(i => i -> s"tok$i word$i end"): _*)
      val a = OrderOps.shuffleOrder(d, "s1").collect().map(_.toSeq).toSet
      val b = OrderOps.shuffleOrder(d, "s1", reliable = true).collect().map(_.toSeq).toSet
      assert(a == b, "durable checkpoint changed the order result")
      val p = OrderOps.packSequences(d, 8).collect().map(_.toSeq).toSet
      val q = OrderOps.packSequences(d, 8, reliable = true).collect().map(_.toSeq).toSet
      assert(p == q, "durable checkpoint changed the packing result")
    } finally prior.foreach(sc.setCheckpointDir)
  }

  // ---- normalization ----

  test("normalizeText composes NFC, lowercases, collapses whitespace, trims") {
    // input carries the DECOMPOSED form E + U+0301; the output must be
    // the composed, lowercased single code point U+00E9
    val d = docsDf(0L -> "  Hello\t\tWORLD  CAFE\u0301 \n x  ")
    val out = TextOps.normalizeText(d).head().getString(1)
    assert(out == "hello world caf\u00e9 x")
    assert(out.length == "hello world cafe x".length) // composed: 1 cp for e-acute
  }

  test("nfc_normalize is SQL-callable after registration and composes") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT nfc_normalize('CAFE\u0301') AS s").head().getString(0)
    assert(r == "CAF\u00c9")
    // codegen and interpreted agree; already-normalized input is identity
    val d = docsDf(0L -> "CAFE\u0301")
    val viaCol = d.select(graft.functions.NfcNormalize.nfcNormalize(col("text"))).head().getString(0)
    assert(viaCol == "CAF\u00c9")
    assert(graft.functions.NfcNormalize.nfcUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii")).toString == "plain ascii")
  }

  test("padWasteReport: hand-costed strategies; packed never beaten; partition-invariant") {
    // token counts (5, 2, 7, 1), capacity 8, batch 2:
    //  naive  (5,2)(7,1): padded = 2*5 + 2*7 = 24
    //  sorted (7,5)(2,1): padded = 2*7 + 2*2 = 18
    //  packed ceil(15/8) = 2 bins: padded = 16
    val d = docsDf(
      0L -> "a a a a a", 1L -> "b b", 2L -> "c c c c c c c", 3L -> "d")
    def run(df: org.apache.spark.sql.DataFrame) =
      OrderOps.padWasteReport(df, capacity = 8, batchSize = 2).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val out = run(d)
    assert(out == Seq(
      ("naive", 2L, 24L, 15L), ("packed", 2L, 16L, 15L), ("sorted", 2L, 18L, 15L)))
    assert(run(d.repartition(3)) == out)
    // waste fractions are the exact divisions
    val waste = OrderOps.padWasteReport(d, 8, 2).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(waste("naive") == 9.0 / 24.0 && waste("packed") == 1.0 / 16.0)
    // truncation: a doc longer than capacity counts as capacity tokens
    val long = docsDf(0L -> Seq.fill(20)("w").mkString(" "))
    val lt = OrderOps.padWasteReport(long, capacity = 8, batchSize = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(lt("naive") == 8L)
  }

  test("zorderLayoutStats: 16x16 grid splits into quadrants under z-order, columns under linear") {
    // 256 grid points, 4 files: morton order makes each file one 8x8
    // quadrant (both envelopes width 8); linear sort makes each file
    // 4 full columns (x width 4, y width 16)
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong, (x * 16 + y).toLong))
      .toDF("x", "y", "tie")
    val out = graft.text.OrderOps.zorderLayoutStats(
      grid, col("x"), col("y"), col("tie"), files = 4, bits = 16)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    for (f <- 0L to 3L) {
      val (n, xmin, xmax, ymin, ymax) = out(("zorder", f))
      assert(n == 64L && xmax - xmin == 7L && ymax - ymin == 7L,
        s"zorder file $f: ${out(("zorder", f))}")
      val (nl, lxmin, lxmax, lymin, lymax) = out(("linear", f))
      assert(nl == 64L && lxmax - lxmin == 3L && lymin == 0L && lymax == 15L,
        s"linear file $f: ${out(("linear", f))}")
    }
  }

  test("bootstrapMeanCi: exact point mean, ordered CI, partition- and replica-rank invariants") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.text.CorpusOps.bootstrapMeanCi(df).collect()(0)
    val r = run(docs)
    val nDocs = r.getLong(0)
    assert(nDocs == docs.count())
    assert(r.getLong(1) == 64L)
    // point estimate is the exact corpus mean
    val totTokens = docs.select(
      sum(size(array_remove(split(col("text"), " "), ""))).cast("long"))
      .collect()(0).getLong(0)
    assert(r.getDouble(2) == totTokens.toDouble / nDocs)
    // CI brackets are ordered and hug the point estimate's scale
    assert(r.getDouble(3) <= r.getDouble(4))
    assert(r.getDouble(3) > 0.0 && r.getDouble(4) < 2.0 * r.getDouble(2))
    // deterministic across partitionings
    assert(run(docs.repartition(7)).toSeq == r.toSeq)
  }

  test("equiDepthHistogram: rank-range depths, ordered exact envelopes, tie splits, partition-invariance") {
    // 10 values with heavy ties; B = 4 -> depths must be 3,3,2,2 and
    // the tied value 5 splits across buckets by the id tiebreak
    val d = Seq(
      (0L, 5L), (1L, 1L), (2L, 5L), (3L, 9L), (4L, 5L),
      (5L, 2L), (6L, 5L), (7L, 7L), (8L, 5L), (9L, 3L)
    ).toDF("doc_id", "n_chars")
    def run(df: org.apache.spark.sql.DataFrame) =
      OrderOps.equiDepthHistogram(df, "n_chars", "doc_id", buckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val h = run(d)
    // sorted values: 1,2,3,5,5,5,5,5,7,9 -> pos*4 div 10 buckets of
    // depth 3,2,3,2
    assert(h.map(_._4) == Seq(3L, 2L, 3L, 2L), s"depths: $h")
    // envelopes are exact values and non-decreasing across buckets
    assert(h == Seq((0L, 1L, 3L, 3L), (1L, 5L, 5L, 2L),
      (2L, 5L, 5L, 3L), (3L, 7L, 9L, 2L)), s"got $h")
    assert(run(d.repartition(5)) == h, "partitioning changed the histogram")
  }
}
