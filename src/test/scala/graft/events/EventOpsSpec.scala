package graft.events

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Temporal event operators: hand-computed session splits and as-of
  * correlations, including the tie and no-match edges the oracle data
  * may not cover.
  */
class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (event_id, user_id, ts, event_type, value)
  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")

  test("sessionize splits on gap, aggregates per session") {
    val e = ev(
      (0L, 1L, 100L, "view", 1.0),
      (1L, 1L, 150L, "view", 2.0),   // gap 50 <= 100: same session
      (2L, 1L, 300L, "view", 4.0),   // gap 150 > 100: new session
      (3L, 2L, 100L, "view", 8.0))   // other user: own session 0
    val out = EventOps.sessionize(e, gap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out((1L, 0L)) == ((2L, 100L, 150L, 3.0)))
    assert(out((1L, 1L)) == ((1L, 300L, 300L, 4.0)))
    assert(out((2L, 0L)) == ((1L, 100L, 100L, 8.0)))
  }

  test("sessionize: gap exactly equal to the threshold does NOT split") {
    val e = ev((0L, 1L, 0L, "view", 1.0), (1L, 1L, 100L, "view", 1.0))
    val out = EventOps.sessionize(e, gap = 100L).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L)
  }

  test("asofLatest picks the most recent right event at or before each left event") {
    val e = ev(
      (0L, 1L, 100L, "click", 1.5),
      (1L, 1L, 200L, "click", 2.5),
      (2L, 1L, 250L, "purchase", 9.0),  // sees click id=1 (ts 200)
      (3L, 1L, 300L, "click", 3.5),
      (4L, 1L, 300L, "purchase", 9.5),  // equal ts: sees click id=3
      (5L, 2L, 50L, "purchase", 7.0),   // user 2 has no click: nulls
      (6L, 2L, 60L, "view", 0.0))       // other types never participate
    val out = EventOps.asofLatest(e, "purchase", "click")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3)),
          (if (r.isNullAt(5)) Double.NaN else r.getDouble(5)))).toMap
    assert(out(2L)._1 == 1L && out(2L)._2 == 2.5)
    assert(out(4L)._1 == 3L && out(4L)._2 == 3.5) // <= convention at equal ts
    assert(out(5L)._1 == -1L && out(5L)._2.isNaN) // left row kept, right null
    assert(!out.contains(6L)) // only leftType rows in the output
  }

  test("asofLatest: a NULL value on the newest right event stays NULL — no frankenrow") {
    // the per-column carry bug took b_value from the OLDER click (2.0)
    // while b_event_id/b_ts came from the newer one — a row matching no
    // actual event; the single-struct carry keeps all b_* fields from
    // the same (newest) event
    val e = Seq(
      (0L, 1L, 100L, "click", Some(2.0)),
      (1L, 1L, 200L, "click", None),          // newest click: NULL value
      (2L, 1L, 300L, "purchase", Some(9.0)))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventOps.asofLatest(e, "purchase", "click").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(3) == 1L && r.getLong(4) == 200L,
      "b_event_id/b_ts must come from the newest click")
    assert(r.isNullAt(5), s"b_value must be NULL (same event), got ${r.get(5)}")
  }

  test("resampleEvents: grid placement, forward fill, lookback counts, tie determinism, off-grid user") {
    val e = ev(
      (0L, 1L, 5L, "x", 1.0),
      (1L, 1L, 10L, "x", 2.0),   // exactly on a tick
      (2L, 1L, 25L, "x", 3.0),
      (3L, 2L, 5L, "x", 9.0))    // single event, first tick 10 > 5: no grid
    val out = EventOps.resampleEvents(e, step = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    // user 1 ticks: 10 (ceil(5/10)*10) and 20; 25 is past the last tick
    assert(out.keySet == Set((1L, 10L), (1L, 20L)))
    assert(out((1L, 10L)) == ((2.0, 2L))) // same-instant event visible; 2 obs in (0, 10]
    assert(out((1L, 20L)) == ((2.0, 0L))) // pure carry-forward, no obs in (10, 20]
    // equal timestamps: the HIGHEST event id's value wins, deterministically
    val tie = ev((1L, 1L, 10L, "x", 7.0), (2L, 1L, 10L, "x", 9.0))
    val t = EventOps.resampleEvents(tie, step = 10L).collect()
    assert(t.length == 1 && t.head.getDouble(2) == 9.0)
  }

  test("jsonFieldStats extracts and aggregates a typed JSON field") {
    val e = Seq(
      (0L, "a", """{"k": 5}"""),
      (1L, "a", """{"k": 7}"""),
      (2L, "b", """{"k": 11, "other": 1}"""))
      .toDF("event_id", "event_type", "props")
    val out = EventOps.jsonFieldStats(e)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((2L, 12L, 5L, 7L)))
    assert(out("b") == ((1L, 11L, 11L, 11L)))
  }

  test("kmeansAssign: two separated blobs cluster by seed, iters=1 is nearest-seed") {
    import org.apache.spark.sql.functions.col
    // blob A along +x (ids 0, 2, 4), blob B along +y (ids 1, 3, 5);
    // seeds k=2 are ids 0 (blob A) and 1 (blob B)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)),
      (4L, Array(0.8f, 0.05f)), (5L, Array(0.02f, 0.7f)))
      .toDF("vec_id", "embedding")
    for (iters <- Seq(1, 2, 3)) {
      val out = graft.vector.VectorOps.kmeansAssign(vecs, k = 2, iters = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L, 5L -> 1L),
        s"iters=$iters: $out")
    }
    // partition-independence: same assignments from a repartitioned input
    val rep = graft.vector.VectorOps.kmeansAssign(vecs.repartition(3), 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep(4L) == 0L && rep(5L) == 1L)
  }

  test("kmeansAssign drops a cluster whose seed attracts no members") {
    // seed 1 = (1,1) sits between the two blobs; after one update every
    // vector is closer to the two surviving centroids and cluster 1
    // may legitimately vanish — the operator must not crash or reseed
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 1.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.05f)), (4L, Array(0.05f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.vector.VectorOps.kmeansAssign(vecs, k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 5)
    assert(out.values.toSet.subsetOf(Set(0L, 1L, 2L)))
  }

  test("percentile_approx (the documented 100 TB path) tracks the exact quantiles") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = graft.text.CorpusOps.lengthQuantiles(docs, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val approx = docs.groupBy(col("lang"))
      .agg(percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("q"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    // percentile_approx returns an actual data point whose RANK is
    // within the accuracy bound of the true median rank; its value can
    // be arbitrarily far if the data has gaps, so assert on rank
    val byLang = docs.select(col("lang"), col("n_chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((lang, a) <- approx) {
      val vs = byLang(lang)
      val below = vs.count(_ < a)
      val atMost = vs.count(_ <= a)
      val target = 0.5 * (vs.length - 1)
      assert(below <= target + 1 && atMost >= target - 1,
        s"$lang: approx $a has rank window [$below, $atMost) vs target $target " +
          s"(exact ${exact(lang)})")
    }
  }

  test("multi-table LSH ANN dominates the single-table run per query") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200)
    def ranked(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.toList).toMap
    val single = ranked(graft.vector.VectorOps.annTopK(e, 8, 64, 5))
    val multi = ranked(graft.vector.VectorOps.annTopKMulti(e, 8, 64, 5, 2))
    // table 0 of the multi run IS the single run, so the unioned
    // candidate set dominates RANK BY RANK (a sum comparison would be
    // wrong: a query short of k single-table candidates legitimately
    // gains extra candidates with NEGATIVE similarity)
    assert(multi.keySet.size >= single.keySet.size)
    for ((q, ss) <- single; (s, m) <- ss.zip(multi(q)))
      assert(m >= s - 1e-9, s"query $q: multi rank sim $m < single $s")
  }

  test("lengthQuantiles interpolates exactly like h = p*(n-1)") {
    // lang "x": lengths 10, 20, 30, 40 -> p50 at h=1.5 -> 25.0;
    // p25 at h=0.75 -> 17.5; p90 at h=2.7 -> 37.0
    val d = Seq((0L, "x", 10L), (1L, "x", 20L), (2L, "x", 30L), (3L, "x", 40L))
      .toDF("doc_id", "lang", "n_chars")
    val out = graft.text.CorpusOps.lengthQuantiles(d, Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(0L) == 17.5 && out(1L) == 25.0)
    assert(math.abs(out(2L) - 37.0) < 1e-9)
  }

  test("retentionCohorts: first-anchor cohorting, distinct weekly activity, non-anchored users excluded") {
    val e = Seq(
      (1L, "signup", 50L), (1L, "click", 55L), (1L, "view", 150L), (1L, "click", 250L),
      (4L, "signup", 70L),                       // cohort 0, never returns
      (2L, "signup", 120L), (2L, "click", 125L), // cohort 1
      (3L, "click", 10L)                         // no signup -> excluded
    ).toDF("user_id", "event_type", "ts")
    val out = EventOps.retentionCohorts(e, "signup", bucket = 100L, maxOffset = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),   // both cohort-0 users active in week 0
      (0L, 1L) -> ((1L, 2L, 0.5)),   // only user 1 returns in week 1
      (0L, 2L) -> ((1L, 2L, 0.5)),
      (1L, 0L) -> ((1L, 1L, 1.0))), s"got $out")
  }

  test("funnel: earliest-completion binding, strict ordering, window cutoffs, zero-reached step") {
    // user 1: view@10 click@20 purchase@25          -> completes all
    // user 2: view@10 click@200 (outside within=50) -> stops at view
    // user 3: click@5 view@10 (click BEFORE view)   -> stops at view
    // user 4: view@10 click@15 purchase@15          -> purchase NOT > click, stops at click
    // user 5: no view at all                        -> never enters
    // EARLIEST binding: user 6 view@10 click@11 click@100 purchase@90
    //   -> click binds at 11, purchase@90 within 50 of 11? 90-11=79 > 50 -> stops at click.
    //   (latest-binding would have passed; pins the greedy semantics)
    val e = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 25L),
      (2L, "view", 10L), (2L, "click", 200L),
      (3L, "click", 5L), (3L, "view", 10L),
      (4L, "view", 10L), (4L, "click", 15L), (4L, "purchase", 15L),
      (5L, "click", 10L), (5L, "purchase", 20L),
      (6L, "view", 10L), (6L, "click", 11L), (6L, "click", 100L), (6L, "purchase", 90L)
    ).toDF("user_id", "event_type", "ts")
    val out = EventOps.funnel(e, Seq("view", "click", "purchase"), within = 50L)
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0) == (("view", 5L, 1.0)))
    assert(out(1) == (("click", 3L, 0.6)))      // users 1, 4, 6
    assert(out(2) == (("purchase", 1L, 0.2)))   // user 1 only
    // a step NOBODY reaches still reports a 0 row
    val out2 = EventOps.funnel(e, Seq("view", "purchase", "signup"), within = 50L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out2(2) == 0L, s"unreached step must report 0: $out2")
  }

  test("eventTypeDrift: uniform -> all-one-type bucket pair, gap buckets dropped") {
    // bucket 0 (ts 0..9): a,a,b,b; bucket 1 (10..19): a,a,a,a;
    // bucket 2 empty; bucket 3 (30..39): a -> only bucket 1 has a
    // predecessor present
    val e = Seq(
      (1L, "a", 0L), (2L, "a", 3L), (3L, "b", 5L), (4L, "b", 9L),
      (5L, "a", 10L), (6L, "a", 12L), (7L, "a", 15L), (8L, "a", 19L),
      (9L, "a", 30L)
    ).toDF("event_id", "event_type", "ts")
    val out = EventOps.eventTypeDrift(e, bucket = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == Set(1L), s"unexpected buckets: ${out.toSeq}")
    val (_, nTypes, js) = out.head
    assert(nTypes == 2L)
    // replay the kernel's exact double math term by term
    def term(cp: Long, np: Long, cc: Long, nc: Long): Long = {
      val p = cp * 1.0 / np; val q = cc * 1.0 / nc; val m = (p + q) / 2.0
      val t = (if (cp > 0) 0.5 * p * math.log(p / m) else 0.0) +
        (if (cc > 0) 0.5 * q * math.log(q / m) else 0.0)
      math.floor(t * 1e12).toLong
    }
    assert(js == term(2, 4, 4, 4) + term(2, 4, 0, 4), s"js=$js")
    assert(js > 0)
  }

  test("rateAnomaly: spike flagged, dead bucket zero-filled and flagged, steady type quiet") {
    // type a: 2 events in buckets 0,1,3,4 and a 14-event SPIKE in
    // bucket 2; type b: 1 event in every bucket except bucket 2 (the
    // DEAD bucket the zero-fill must materialize). Daily analog with
    // bucket = 10 ticks.
    val rows =
      (for (b <- Seq(0L, 1L, 3L, 4L); i <- 0 until 2)
        yield ("a", b * 10 + i)) ++
      (0 until 14).map(i => ("a", 20L + i % 10)) ++
      Seq(0L, 1L, 3L, 4L).map(b => ("b", b * 10 + 5))
    val e = rows.zipWithIndex
      .map { case ((t, ts), i) => (i.toLong, t, ts) }
      .toDF("event_id", "event_type", "ts")
    val out = EventOps.rateAnomaly(e, bucket = 10L, cut = 3.5).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5), r.getBoolean(6))).toMap
    // frame is types x full range: 2 x 5 rows, incl. b's dead bucket
    assert(out.size == 10, s"expected 10 dense rows, got ${out.size}")
    // types a and b are MAD-degenerate by construction (a majority of
    // identical counts -> MAD 0 -> the mad>0 guard reads z = 0, the
    // documented robustOutliers behavior); here they pin the counts
    // and the zero-fill, and type c below pins the z semantics
    val aCounts = Seq(0L, 1L, 2L, 3L, 4L).map(b => out(("a", b))._1)
    assert(aCounts == Seq(2L, 2L, 14L, 2L, 2L))
    val bCounts = Seq(0L, 1L, 2L, 3L, 4L).map(b => out(("b", b))._1)
    assert(bCounts == Seq(1L, 1L, 0L, 1L, 1L))
    assert(out(("b", 2L))._1 == 0L, "dead bucket must be zero-filled")
    // the z/flag semantics under a real MAD: type c with a genuine
    // spread {1,2,3,4,100}: med 3, MAD 1, z(100) = 0.6745*97 = 65.4265
    val c = (Seq((0L, 1), (1L, 2), (2L, 3), (3L, 4), (4L, 100))
      .flatMap { case (b, n) => (0 until n).map(i => ("c", b * 10 + i % 10)) })
      .zipWithIndex.map { case ((t, ts), i) => (1000L + i, t, ts) }
      .toDF("event_id", "event_type", "ts")
    val oc = EventOps.rateAnomaly(c, bucket = 10L, cut = 3.5).collect()
      .map(r => r.getLong(1) -> (r.getDouble(5), r.getBoolean(6))).toMap
    assert(oc(4L)._1 == 65.4265 && oc(4L)._2, s"spike z: ${oc(4L)}")
    assert(!oc(0L)._2 && !oc(1L)._2, "steady buckets must stay quiet")
  }

  test("asofNearest: forward nearest within tolerance, inclusive same-ts match, id tie-break, backward mirror") {
    // user 1: L@100 with R@90 (behind), R@100 (same tick), R@105;
    //         L@200 with next R@260 — outside tolerance 50
    val ev = Seq(
      (1L, 1L, 100L, "L", 0.0), (2L, 1L, 90L, "R", 9.0),
      (3L, 1L, 100L, "R", 1.0), (4L, 1L, 105L, "R", 2.0),
      (5L, 1L, 200L, "L", 0.0), (6L, 1L, 260L, "R", 3.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val fwd = EventOps.asofNearest(ev, "L", "R", forward = true, toleranceUs = 50L)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3)),
         (if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    assert(fwd(1L) == ((3L, 0L)), s"same-ts inclusive: ${fwd(1L)}")
    assert(fwd(5L) == ((-1L, -1L)), s"beyond tolerance must null: ${fwd(5L)}")
    // equal right timestamps: the smaller event id wins
    val tie = Seq(
      (1L, 1L, 100L, "L", 0.0),
      (8L, 1L, 110L, "R", 8.0), (7L, 1L, 110L, "R", 7.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val t = EventOps.asofNearest(tie, "L", "R", forward = true, toleranceUs = 50L)
      .collect().head
    assert(t.getLong(3) == 7L && t.getLong(6) == 10L, s"tie pick: $t")
    // backward mirror: L@200 matches the latest prior R within 150
    val back = EventOps.asofNearest(ev, "L", "R", forward = false, toleranceUs = 150L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(back(5L) == 4L, s"backward nearest: ${back(5L)}")
    // backward equal-right-ts tie: the smaller event id wins, same
    // rule as forward (the frame orders id DESC so last() lands on it)
    val tieB = Seq(
      (1L, 1L, 100L, "L", 0.0),
      (8L, 1L, 90L, "R", 8.0), (7L, 1L, 90L, "R", 7.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val tb = EventOps.asofNearest(tieB, "L", "R", forward = false, toleranceUs = 50L)
      .collect().head
    assert(tb.getLong(3) == 7L && tb.getLong(6) == 10L, s"backward tie pick: $tb")
  }

  test("retransmissionStats: within-tolerance repeats flagged, value/type/user changes never") {
    // user 1 type A value 1.0: t=0, 10 (retrans), 100 (beyond tol 50)
    // user 1 type A value 2.0 at t=12: different value, never a dup
    // user 2 type A value 1.0 at t=11: different user, never a dup
    // type B single event: clean
    val ev = Seq(
      (1L, 1L, 0L, "A", 1.0), (2L, 1L, 10L, "A", 1.0), (3L, 1L, 100L, "A", 1.0),
      (4L, 1L, 12L, "A", 2.0), (5L, 2L, 11L, "A", 1.0), (6L, 1L, 5L, "B", 9.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = EventOps.retransmissionStats(ev, toleranceUs = 50L).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("A") == ((5L, 1L, 200000L)), s"A: ${r("A")}")
    assert(r("B") == ((1L, 0L, 0L)), s"B: ${r("B")}")
    // equal timestamps: the later event id is the duplicate
    val tie = Seq((1L, 1L, 7L, "A", 1.0), (2L, 1L, 7L, "A", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val t = EventOps.retransmissionStats(tie, toleranceUs = 50L).collect().head
    assert(t.getLong(1) == 2L && t.getLong(2) == 1L, s"tie: $t")
  }

  test("kAnonymityReport: hand-computed class histogram, below-k mass in exact ppm") {
    // classes: A x3, B x1, C x7 under k = 5 -> below-k classes {A, B}
    // carrying 4 of the 11 rows; ppm truncates 4e6/11 = 363636
    val rows = (Seq.fill(3)("A") ++ Seq.fill(1)("B") ++ Seq.fill(7)("C"))
      .zipWithIndex.map { case (qi, i) => (i.toLong, qi) }
      .toDF("event_id", "qi")
    val r = EventOps.kAnonymityReport(rows, Seq("qi"), k = 5L).collect()
    assert(r.length == 1)
    val f = r.head
    assert(f.getLong(0) == 11L && f.getLong(1) == 3L, s"rows/classes: $f")
    assert(f.getLong(2) == 1L && f.getLong(3) == 7L, s"min/max: $f")
    assert(f.getLong(4) == 2L && f.getLong(5) == 4L, s"below-k: $f")
    assert(f.getLong(6) == 363636L, s"ppm: $f")
    // fully k-anonymous table reads zero risk
    val ok = Seq.fill(5)("A").zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("event_id", "qi")
    val g = EventOps.kAnonymityReport(ok, Seq("qi"), k = 5L).collect().head
    assert(g.getLong(4) == 0L && g.getLong(5) == 0L && g.getLong(6) == 0L)
  }
}
