package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface: the same tumbling-window aggregation
  * as the batch `q_events_window` query, expressed as
  * readStream -> watermark -> window agg -> writeStream. Batch and
  * streaming share the one logical definition — Spark's unified
  * Dataset API — so the correctness oracle for the batch form covers
  * the streaming transform too.
  */
object StreamOps {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // int64 micro ticks (EventOps.toMicros)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The shared transform: micros -> timestamp, 1h tumbling window per
    * event_type, count + sum. Callers normalize the raw parquet ts
    * with [[graft.events.EventOps.toMicros]] before staging.
    */
  def windowedAgg(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val ts = events.withColumn("ts2", timestamp_micros(col("ts")))
    val wm = if (withWatermark) ts.withWatermark("ts2", "2 hours") else ts
    wm.groupBy(window(col("ts2"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select((unix_timestamp(col("w.start")) * 1000).as("window_start_ms"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** File-source streaming variant over a directory of event parquet. */
  def streamFromDir(spark: SparkSession, dir: String): DataFrame = {
    val src = spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    windowedAgg(src, withWatermark = true)
  }

  /** STREAMING SESSIONIZATION: the event-time session aggregation that
    * matches [[graft.events.EventOps.sessionize]]'s batch semantics
    * (same gap rule — a session absorbs an event whose distance to the
    * session's current end is <= gap). Spark's native `session_window`
    * carries the merge logic in the state store; the watermark bounds
    * state: sessions older than the watermark finalize and emit, so
    * state is O(open sessions), not O(events) — the only shape that
    * survives an unbounded stream. Timestamps arrive as int64 micros
    * (the cross-engine tick unit used by the batch harness).
    */
  def streamingSessionize(events: DataFrame, gap: String = "4 hours"): DataFrame =
    events.withColumn("ts2", timestamp_micros(col("ts")))
      .withWatermark("ts2", "1 hour")
      .groupBy(session_window(col("ts2"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_us"), max(col("ts")).as("end_us"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"),
        col("sum_value"))

  /** STREAM-STREAM interval join: events of `leftType` joined to the
    * SAME user's `rightType` events from the trailing `window` —
    * "purchases with the clicks of the preceding hour". This is the
    * canonical two-stream shape Structured Streaming can run
    * unbounded: the equi-key (user) routes both streams to the same
    * state partition, and the event-time range condition PLUS both
    * watermarks lets the state store evict rows older than
    * `watermark + window` — without the time bound the join would
    * have to buffer both streams forever. Batch semantics are the
    * plain inequality join, which the parity spec mirrors.
    *
    * Timestamps arrive as int64 micros (the tick unit of the batch
    * harness); emitted back as micros.
    */
  def streamingIntervalJoin(
      events: DataFrame, leftType: String, rightType: String,
      window: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val base = events.withColumn("ts2", timestamp_micros(col("ts")))
    val l = base.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_event_id"), col("user_id"),
        col("ts2").as("l_ts"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = base.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user"),
        col("ts2").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") <= col("l_ts") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $window"))
      .select(col("l_event_id"), col("user_id"),
        unix_micros(col("l_ts")).as("l_ts_us"),
        col("r_event_id"), unix_micros(col("r_ts")).as("r_ts_us"),
        col("r_value"))
  }

  /** STREAMING EVENT DEDUP with BOUNDED state: at-least-once delivery
    * (replayed Kafka offsets, retried batches) dedups by event id via
    * `dropDuplicatesWithinWatermark` — unlike plain `dropDuplicates`,
    * whose state grows with every id ever seen, the watermark lets the
    * state store EVICT ids older than the lateness bound, so state is
    * O(events per watermark window): the only exact-dedup shape that
    * survives an unbounded stream when ids don't repeat outside the
    * redelivery horizon. Timestamps arrive as int64 micros.
    */
  def streamingEventDedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withColumn("ts2", timestamp_micros(col("ts")))
      .withWatermark("ts2", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .drop("ts2")

  final case class RetransBuf(lastTs: Long, pending: List[(Long, Long)])

  /** STREAMING RETRANSMISSION FLAGS — the live half of
    * [[graft.events.EventOps.retransmissionStats]]'s hygiene gate:
    * every arriving event is flagged against the SAME (user, type,
    * value) group's previous event as it finalizes, so the dedup
    * decision happens at ingest, not in a nightly batch. Group state
    * is ONE cursor (the last finalized timestamp) plus the in-flight
    * buffer inside the lateness bound:
    *
    *  - an event finalizes (emits exactly once, in (ts, id) order —
    *    the batch lag's frame order) when the watermark passes its
    *    timestamp; its flag compares against the cursor, then it
    *    BECOMES the cursor, matching lag(1) exactly (a duplicate's
    *    duplicate compares to the duplicate, not the original);
    *  - the cursor itself expires once the watermark is more than
    *    `toleranceUs` past it — no future in-time event can land
    *    within tolerance, so steady-state state for a quiet key is
    *    ZERO, not one row per (user, type, value) ever seen;
    *  - an EventTimeTimeout on the earliest pending event (or the
    *    cursor's expiry) drains groups the source goes quiet on.
    *
    * Emits (event_id, event_type, is_retrans); the per-type ppm
    * rollup over the emitted flags reproduces the batch report —
    * StreamSpec pins it across a timeline-split arrival.
    */
  def streamingRetransFlags(
      events: DataFrame, toleranceUs: Long,
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(toleranceUs > 0, s"tolerance must be positive, got $toleranceUs")
    val spark = events.sparkSession
    import spark.implicits._
    val NoTs = Long.MinValue
    // ts2 must SURVIVE the projection (see streamingAsofLatest)
    val base = events.withColumn("ts2", timestamp_micros(col("ts")))
      .withWatermark("ts2", watermark)
      .select(col("user_id").cast("long"), col("event_type"),
        col("value").cast("double"), col("ts").cast("long"),
        col("event_id").cast("long"), col("ts2"))
      .as[(Long, String, Option[Double], Long, Long, java.sql.Timestamp)]
    base.groupByKey(r => (r._1, r._2, r._3))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String, Option[Double]),
            rows: Iterator[(Long, String, Option[Double], Long, Long, java.sql.Timestamp)],
            state: GroupState[RetransBuf]) =>
          val st = state.getOption.getOrElse(RetransBuf(NoTs, Nil))
          var pending = st.pending
          rows.foreach(r => pending ::= ((r._4, r._5)))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strictly below the watermark, the asof twins' boundary rule
          val (ready, rest) = pending.partition(_._1 < wmUs)
          var last = st.lastTs
          val out = ready.sorted.map { case (ts, id) =>
            val isR = last != NoTs && ts - last <= toleranceUs
            last = ts
            (id, key._2, isR)
          }
          // the cursor is dead once no in-time arrival can sit within
          // tolerance of it
          val cursorLive = last != NoTs && last + toleranceUs >= wmUs
          if (rest.isEmpty && !cursorLive) {
            if (state.exists) state.remove()
          } else {
            state.update(RetransBuf(if (cursorLive || rest.nonEmpty) last else NoTs, rest))
            val wake =
              if (rest.nonEmpty) rest.map(_._1).min
              else last + toleranceUs
            state.setTimeoutTimestamp(wake / 1000L + 1L)
          }
          out.iterator
      }
      .toDF("event_id", "event_type", "is_retrans")
  }

  final case class AsofEv(ts: Long, id: Long, value: Option[Double])
  final case class AsofBuf(anchors: List[AsofEv], probes: List[AsofEv])

  /** STREAMING AS-OF JOIN — the twin of
    * [[graft.events.EventOps.asofLatest]], the one event operator
    * Structured Streaming has no native shape for (stream-stream joins
    * need a two-sided time BOUND; as-of's "latest right at or before,
    * however old" has none). Custom state via flatMapGroupsWithState
    * keyed by user:
    *
    *  - right events (anchors) and left events (probes) buffer in
    *    group state as they arrive;
    *  - a probe emits exactly once, when the event-time watermark
    *    passes its timestamp — at that point every anchor at-or-before
    *    it has arrived, so the match is FINAL (same `<=` convention
    *    and (ts, id) tie-break as the batch window carry; unmatched
    *    probes emit null right columns);
    *  - state stays bounded: anchors at-or-before the watermark
    *    compact to the single latest one (the only anchor any future
    *    probe can match), so steady-state is O(1) per user plus
    *    in-flight events inside the lateness bound;
    *  - an EventTimeTimeout on the earliest pending probe fires the
    *    group when the watermark passes it even if the user sends no
    *    further events.
    *
    * Timestamps arrive as int64 micros (the batch harness tick);
    * `GroupState.getCurrentWatermarkMs` is millis — converted at the
    * boundary. StreamSpec pins batch == stream row for row.
    */
  def streamingAsofLatest(
      events: DataFrame, leftType: String, rightType: String,
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // ts2 must SURVIVE the projection: the event-time-timeout check
    // looks for the watermarked column among the stateful operator's
    // inputs (the kernel itself never reads it)
    val base = events.withColumn("ts2", timestamp_micros(col("ts")))
      .withWatermark("ts2", watermark)
      .filter(col("event_type") === leftType || col("event_type") === rightType)
      .select(col("user_id").cast("long"), col("event_type"),
        col("ts").cast("long"), col("event_id").cast("long"), col("value").cast("double"),
        col("ts2"))
      .as[(Long, String, Long, Long, Option[Double], java.sql.Timestamp)]
    base.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, Long, Option[Double], java.sql.Timestamp)],
            state: GroupState[AsofBuf]) =>
          val st = state.getOption.getOrElse(AsofBuf(Nil, Nil))
          var anchors = st.anchors
          var probes = st.probes
          // two independent ifs, not if/else: when leftType ==
          // rightType the batch twin unions every event into BOTH
          // sides (each event self-matches); exclusive routing would
          // silently emit nothing for that parameterization
          rows.foreach { case (_, typ, ts, id, v, _) =>
            if (typ == rightType) anchors ::= AsofEv(ts, id, v)
            if (typ == leftType) probes ::= AsofEv(ts, id, v)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // STRICTLY below the watermark: Spark only guarantees events
          // strictly older than the watermark are dropped, so an anchor
          // with ts == wm can still arrive in a later batch — a probe
          // finalized at == would miss it and diverge from the batch
          // asofLatest at the exact boundary (one extra batch of
          // latency buys boundary-exact parity)
          val (ready, pending) = probes.partition(_.ts < wmUs)
          val out = ready.sortBy(p => (p.ts, p.id)).map { p =>
            val m = anchors.filter(a => a.ts <= p.ts)
            val best = if (m.isEmpty) None else Some(m.maxBy(a => (a.ts, a.id)))
            (p.id, user, p.ts, best.map(_.id), best.map(_.ts), best.flatMap(_.value))
          }
          // compact: anchors the watermark passed collapse to the one
          // any future probe (ts > wm) could still match
          val (future, past) = anchors.partition(_.ts > wmUs)
          val keepPast = if (past.isEmpty) Nil else List(past.maxBy(a => (a.ts, a.id)))
          val next = AsofBuf(future ++ keepPast, pending)
          if (next.anchors.isEmpty && next.probes.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(next)
            if (pending.nonEmpty)
              // +1 ms: the registered timestamp must exceed the current
              // watermark even when the probe lands in the same
              // millisecond after micros -> millis truncation
              state.setTimeoutTimestamp(pending.map(_.ts).min / 1000L + 1L)
          }
          out.iterator
      }
      .toDF("event_id", "user_id", "ts", "b_event_id", "b_ts", "b_value")
  }

  /** STREAMING FORWARD AS-OF JOIN — the twin of
    * [[graft.events.EventOps.asofNearest]] with `forward = true`
    * (pandas merge_asof direction='forward' with tolerance): each left
    * event matches the EARLIEST right event in [ts, ts + tolerance],
    * smallest event id on equal right timestamps, null columns when
    * none. The state shape differs from the backward twin in one
    * essential way: a probe's match horizon extends FORWARD, so it
    * finalizes only when the watermark passes `ts + tolerance` (every
    * right event that could still win has then arrived), not its own
    * timestamp — the tolerance is what makes a forward as-of
    * streamable at all (without it no probe could ever finalize).
    *
    *  - probes (left) and anchors (right) buffer in per-user group
    *    state; a probe emits exactly once, when `ts + tolerance` falls
    *    strictly below the watermark (same strictness reasoning as the
    *    backward twin's boundary note);
    *  - anchors compact to those at or after `min(watermark, earliest
    *    pending probe ts)` — anything earlier can never be inside a
    *    live or future probe's forward horizon, so state is bounded by
    *    the tolerance + lateness window, O(in-flight) per user;
    *  - an EventTimeTimeout on the earliest pending probe's horizon
    *    end fires the group when the watermark passes it even if the
    *    user goes quiet.
    *
    * Emits the batch face's exact columns (event_id, user_id, ts,
    * b_event_id, b_ts, b_value, lag_us); StreamSpec pins batch ==
    * stream row for row across multi-batch arrival.
    */
  def streamingAsofNearestForward(
      events: DataFrame, leftType: String, rightType: String,
      toleranceUs: Long, watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(toleranceUs > 0, s"tolerance must be positive, got $toleranceUs")
    val spark = events.sparkSession
    import spark.implicits._
    // ts2 must SURVIVE the projection (see streamingAsofLatest)
    val base = events.withColumn("ts2", timestamp_micros(col("ts")))
      .withWatermark("ts2", watermark)
      .filter(col("event_type") === leftType || col("event_type") === rightType)
      .select(col("user_id").cast("long"), col("event_type"),
        col("ts").cast("long"), col("event_id").cast("long"), col("value").cast("double"),
        col("ts2"))
      .as[(Long, String, Long, Long, Option[Double], java.sql.Timestamp)]
    base.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, Long, Option[Double], java.sql.Timestamp)],
            state: GroupState[AsofBuf]) =>
          val st = state.getOption.getOrElse(AsofBuf(Nil, Nil))
          var anchors = st.anchors
          var probes = st.probes
          // two independent ifs (leftType == rightType unions into
          // both sides, as in the batch twin)
          rows.foreach { case (_, typ, ts, id, v, _) =>
            if (typ == rightType) anchors ::= AsofEv(ts, id, v)
            if (typ == leftType) probes ::= AsofEv(ts, id, v)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // a probe is final when its whole forward horizon
          // [ts, ts + tolerance] lies STRICTLY below the watermark
          val (ready, pending) = probes.partition(p => p.ts + toleranceUs < wmUs)
          val out = ready.sortBy(p => (p.ts, p.id)).map { p =>
            val m = anchors.filter(a => a.ts >= p.ts && a.ts <= p.ts + toleranceUs)
            val best = if (m.isEmpty) None else Some(m.minBy(a => (a.ts, a.id)))
            (p.id, user, p.ts, best.map(_.id), best.map(_.ts),
              best.flatMap(_.value), best.map(_.ts - p.ts))
          }
          // compact: anchors before every live horizon's start are
          // unreachable (a future probe arrives at or after the
          // watermark, so its horizon starts at or after it too)
          val floorTs = (wmUs :: pending.map(_.ts)).min
          val next = AsofBuf(anchors.filter(_.ts >= floorTs), pending)
          if (next.anchors.isEmpty && next.probes.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(next)
            if (pending.nonEmpty)
              // +1 ms past the micros -> millis truncation, as in the
              // backward twin
              state.setTimeoutTimestamp(
                (pending.map(_.ts).min + toleranceUs) / 1000L + 1L)
            else
              // anchors but no probes: without a timeout this group
              // never wakes again and a quiet user retains its last
              // window's full anchor buffer forever (the backward twin
              // keeps O(1) BY DESIGN — its one past anchor stays
              // matchable indefinitely; here every anchor dies once the
              // watermark passes it). Fire once the watermark passes the
              // last anchor: the compaction floor (= watermark) then
              // exceeds every anchor ts, the buffer empties, and the
              // state is removed. Safe to register: kept anchors satisfy
              // ts >= floorTs >= wmUs, so the timestamp is in the future.
              state.setTimeoutTimestamp(next.anchors.map(_.ts).max / 1000L + 1L)
          }
          out.iterator
      }
      .toDF("event_id", "user_id", "ts", "b_event_id", "b_ts", "b_value", "lag_us")
  }

  final case class FunnelBuf(depth: Int, tprev: Long, pending: List[(Long, String)])

  /** STREAMING FUNNEL DEPTH — the twin of
    * [[graft.events.EventOps.funnel]]'s per-user step chain. A user's
    * funnel depth is never final on an unbounded stream (a future
    * event can always extend the chain), so the streaming form emits
    * MONOTONE depth updates in Update mode: one (user, step_idx) row
    * whenever the finalized chain advances; the row for a user's
    * maximum step_idx is the batch funnel's per-user contribution, and
    * `n_users(i) = |{users with max step_idx >= i}|` reproduces the
    * batch aggregate at any cut point.
    *
    * Exactness under out-of-order arrival: the batch chain is
    * `tprev(i+1) = min ts of step i+1 events with tprev(i) < ts <=
    * tprev(i) + within`, which equals greedy advancement over the
    * user's events in ascending-ts order — so events buffer in group
    * state until the watermark passes them (no earlier event can then
    * arrive), and only that finalized, sorted prefix drives the chain.
    * State is the chain cursor (depth, tprev) plus the in-flight
    * buffer, bounded by the lateness horizon; a completed user drains
    * arrivals with no buffering.
    */
  def streamingFunnelDepth(
      events: DataFrame, steps: Seq[String], within: Long,
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "funnel needs at least one step")
    require(within > 0, s"within must be positive, got $within")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val base = events.withColumn("ts2", timestamp_micros(col("ts")))
      .withWatermark("ts2", watermark)
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id").cast("long"), col("event_type"),
        col("ts").cast("long"), col("ts2"))
      .as[(Long, String, Long, java.sql.Timestamp)]
    base.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
            state: GroupState[FunnelBuf]) =>
          val st = state.getOption.getOrElse(FunnelBuf(0, Long.MinValue, Nil))
          var pending = st.pending
          rows.foreach { case (_, typ, ts, _) =>
            // a fully-converted user's chain cannot extend: drain
            if (st.depth < steps.length) pending ::= ((ts, typ))
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strictly below the watermark, as in streamingAsofLatest:
          // an event AT the watermark can still arrive in a later batch
          val (ready, hold) = pending.partition(_._1 < wmUs)
          var depth = st.depth
          var tprev = st.tprev
          ready.sortBy(_._1).foreach { case (ts, typ) =>
            if (depth < steps.length && stepIdx(typ) == depth &&
                (depth == 0 || (ts > tprev && ts - tprev <= within))) {
              depth += 1
              tprev = ts
            }
          }
          val out =
            if (depth > st.depth) Iterator.single((user, depth - 1)) else Iterator.empty
          val next = FunnelBuf(depth, tprev, if (depth >= steps.length) Nil else hold)
          if (next.pending.isEmpty && next.depth == 0) {
            if (state.exists) state.remove()
          } else {
            state.update(next)
            if (next.pending.nonEmpty)
              state.setTimeoutTimestamp(next.pending.map(_._1).min / 1000L + 1L)
          }
          out
      }
      .toDF("user_id", "step_idx")
  }

  final case class RetentionBuf(
      minAnchor: Option[Long], emitted: Long, pending: List[Long])

  /** STREAMING RETENTION FACTS — the twin of
    * [[graft.events.EventOps.retentionCohorts]]: one APPEND-mode row
    * per (user, cohort_bucket, k) the first time that retention fact
    * becomes FINAL, i.e. exactly the distinct (user, offset) pairs the
    * batch operator counts; `groupBy(cohort_bucket, k).count()`
    * downstream reproduces n_active (and k = 0 is the cohort size,
    * since the anchor event is itself activity).
    *
    * Finality logic: a user's cohort is the MINIMUM anchor timestamp,
    * so it is final once the watermark passes the current minimum (any
    * later-arriving anchor would have ts >= watermark >= min). Until
    * then activity buffers. Activity seen before ANY anchor is
    * dropped once the watermark passes its bucket — a future anchor's
    * bucket is >= the watermark's, so such activity could only ever
    * land at k < 0: the drop is exact, and it bounds state for
    * anchor-less users. The emitted-offset set is a bitmask (maxOffset
    * <= 62), so steady-state is O(1) per user plus the in-flight
    * buffer inside the lateness horizon.
    */
  def streamingRetention(
      events: DataFrame, anchorType: String, bucket: Long, maxOffset: Int,
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(bucket > 0 && maxOffset >= 0 && maxOffset <= 62,
      s"bad params: bucket=$bucket maxOffset=$maxOffset")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.withColumn("ts2", timestamp_micros(col("ts")))
      .withWatermark("ts2", watermark)
      .select(col("user_id").cast("long"), col("event_type"),
        col("ts").cast("long"), col("ts2"))
      .as[(Long, String, Long, java.sql.Timestamp)]
    base.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
            state: GroupState[RetentionBuf]) =>
          val st = state.getOption.getOrElse(RetentionBuf(None, 0L, Nil))
          var minAnchor = st.minAnchor
          var pending = st.pending
          rows.foreach { case (_, typ, ts, _) =>
            if (typ == anchorType && !minAnchor.exists(_ <= ts)) minAnchor = Some(ts)
            pending ::= ts
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var emitted = st.emitted
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          val cohortFinal = minAnchor.exists(_ < wmUs)
          if (cohortFinal) {
            val cb = Math.floorDiv(minAnchor.get, bucket)
            val (ready, hold) = pending.partition(_ < wmUs)
            ready.foreach { ts =>
              val k = Math.floorDiv(ts, bucket) - cb
              if (k >= 0 && k <= maxOffset && (emitted & (1L << k)) == 0L) {
                emitted |= 1L << k
                out += ((cb, k, user))
              }
            }
            pending = hold
          } else if (minAnchor.isEmpty) {
            // no anchor yet: future anchors sit at bucket >= the
            // watermark's, so activity in strictly-older buckets can
            // only produce k < 0 — drop it (exact, bounds state)
            val wmBucket = Math.floorDiv(wmUs, bucket)
            pending = pending.filter(ts => Math.floorDiv(ts, bucket) >= wmBucket)
          }
          val next = RetentionBuf(minAnchor, emitted, pending)
          if (next.minAnchor.isEmpty && next.pending.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(next)
            val wake = (next.pending ++ next.minAnchor.filter(_ => !cohortFinal)).minOption
            // clamp to the watermark: the minimum buffered timestamp can
            // sit BELOW it (pre-anchor activity buffered while the anchor
            // is still >= watermark, or retained same-bucket activity) and
            // Spark throws for event-time timeouts below the watermark
            wake.foreach(w => state.setTimeoutTimestamp(
              math.max(w / 1000L + 1L, state.getCurrentWatermarkMs() + 1L)))
          }
          out.iterator
      }
      .toDF("cohort_bucket", "k", "user_id")
  }

  final case class SpanBuf(maxTs: Long, positions: List[Long])

  /** STREAMING EXACT-SUBSTRING SPANS — the twin of
    * [[graft.text.CorpusOps.dupSubstringSpans]] for the realistic
    * deployment shape: the duplicated-gram set is built from the
    * historical corpus in BATCH ([[graft.text.CorpusOps.dupGramSet]])
    * and arriving documents are tagged against it. The gram explode
    * and the hash are the shared batch column expressions; the
    * duplicated-gram membership check is a STREAM-STATIC equi-join
    * (stateless per microbatch — Spark shuffles or broadcasts the
    * static side like any batch join, so the set never has to fit on
    * one node); the per-document anchor merge is
    * `flatMapGroupsWithState` keyed on doc id, finalized by event-time
    * timeout once the watermark passes the document's timestamp —
    * state is one position list bounded by document length, exactly
    * the batch kernel's footprint.
    *
    * Emits (doc_id, span_start, span_end, n_anchors) in Append mode —
    * identical rows to the batch operator restricted to grams
    * duplicated in the REFERENCE corpus (a self-join of the live
    * stream against its own history is the batch operator re-run, not
    * a streaming op).
    */
  def streamingDupSubstringSpans(
      docs: DataFrame, dupGrams: DataFrame, n: Int = 8,
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val anchorStream = docs
      .withColumn("ts2", timestamp_micros(col("ts")))
      .withWatermark("ts2", watermark)
      .select(col("doc_id").cast("long").as("id"), col("ts").cast("long"),
        col("ts2"), graft.text.TextOps.tokens(col("text")).as("toks"))
      .select(col("id"), col("ts"), col("ts2"),
        posexplode(graft.text.CorpusOps.shinglesOf(col("toks"), n)))
      .select(col("id"), col("ts"), (col("pos") + 1).cast("long").as("p"),
        graft.text.TextOps.tokenHash(col("col")).as("g"), col("ts2"))
      .join(dupGrams.select(col("g")), "g") // stream-static inner join
      .select(col("id"), col("ts"), col("p"), col("ts2"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
    anchorStream.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (id: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
            state: GroupState[SpanBuf]) =>
          if (state.hasTimedOut) {
            // watermark passed every buffered anchor's timestamp: the
            // document's gram set is final — merge and emit
            val ps = state.get.positions.toArray
            state.remove()
            graft.text.CorpusOps.mergeAnchors(ps, n)
              .map { case (s, e, c) => (id, s, e, c) }.iterator
          } else {
            val st = state.getOption.getOrElse(SpanBuf(Long.MinValue, Nil))
            var maxTs = st.maxTs
            var positions = st.positions
            rows.foreach { case (_, ts, p, _) =>
              if (ts > maxTs) maxTs = ts
              positions ::= p
            }
            state.update(SpanBuf(maxTs, positions))
            // wake once the watermark passes the doc's latest gram;
            // clamped — buffered timestamps can sit below the current
            // watermark and Spark rejects a wake time that does
            state.setTimeoutTimestamp(
              math.max(maxTs / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
      .toDF("doc_id", "span_start", "span_end", "n_anchors")
  }

  /** Streaming EXACT dedup with custom state
    * (`flatMapGroupsWithState`): key on the content hash, keep one bit
    * of state per distinct text, emit only the FIRST document carrying
    * each content — the streaming form of `TextOps.exactDedup`'s
    * keeper selection. State is one boolean per distinct hash: the
    * minimal footprint for exact streaming dedup at corpus scale
    * (bounded by distinct contents, not stream length).
    */
  def streamingExactDedup(docs: DataFrame): org.apache.spark.sql.Dataset[(String, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(md5(col("text")).as("text_hash"), col("doc_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (hash: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) {
            rows.foreach(_ => ()) // drain: all duplicates of known content
            Iterator.empty
          } else {
            state.update(true)
            // first occurrence in arrival order wins within the batch
            var best = Long.MaxValue
            rows.foreach { case (_, id) => if (id < best) best = id }
            Iterator.single((hash, best))
          }
      }
  }

  final case class WsBuf(seq: Long, ids: List[Long], sims: List[Double])

  /** STREAMING WEIGHTED SAMPLE — the unbounded-stream twin of
    * [[graft.text.TextOps.weightedSamplePerStratum]]: the A-ES
    * exponential race over an ARRIVING corpus, maintained as k-best
    * state per stratum. Because the race key `ln(u)/w` is a pure
    * deterministic function of (salt, id, weight), a streamed corpus
    * converges to EXACTLY the batch sample — arrival order, batch
    * boundaries, and re-deliveries (same id ⇒ same key, deduplicated
    * against the held sample) cannot change the winners.
    *
    * State is the k-entry heap per stratum — BOUNDED BY CONSTRUCTION,
    * the only growth axis is the stratum count, so the operator
    * survives an unbounded stream (the
    * `dropDuplicatesWithinWatermark` contract, but with zero
    * eviction pressure). Update-mode emission: whenever a batch
    * changes a stratum's sample, the stratum's ENTIRE current sample
    * re-emits under an incremented `emit_seq` — a consumer (and the
    * parity spec) reads the max-seq emission per stratum as the
    * current sample. Comparator = the batch TopK's
    * (key DESC, id ASC) via `Double.compare`, so ranks match the
    * batch operator exactly.
    */
  def streamingWeightedSample(
      docs: DataFrame, k: Int, salt: String = "graft",
      keyCol: String = "source", idCol: String = "doc_id",
      weightCol: String = "n_chars"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val h = conv(substring(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4503599627370496.0)
    def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }
    docs.filter(col(weightCol) > 0)
      .select(col(keyCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("id"),
        (log(u) / col(weightCol).cast("double")).as("s"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (stratum: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[WsBuf]) =>
          val prev = state.getOption.getOrElse(WsBuf(0L, Nil, Nil))
          var ids = prev.ids
          var sims = prev.sims
          rows.foreach { case (_, id, s) =>
            if (!ids.contains(id)) {
              // insert in (s DESC, id ASC) order, then cut to k
              val (pre, post) = ids.zip(sims).span {
                case (i2, s2) => better(s2, i2, s, id)
              }
              val merged = (pre ++ ((id, s) :: post.toList)).take(k)
              ids = merged.map(_._1)
              sims = merged.map(_._2)
            }
          }
          if (ids == prev.ids) Iterator.empty
          else {
            val seq = prev.seq + 1L
            state.update(WsBuf(seq, ids, sims))
            ids.iterator.zipWithIndex.map { case (id, r) =>
              (stratum, id, r.toLong + 1L, seq)
            }
          }
      }
      .toDF("stratum", idCol, "rank_in_stratum", "emit_seq")
      .withColumnRenamed("stratum", keyCol)
  }

  /** STREAMING WORDPIECE ENCODING — the deployment shape of
    * [[graft.text.TextOps.wordpieceEncode]]: the piece inventory is
    * trained in batch on the historical corpus (the artifact a
    * tokenizer ships) and arriving documents are encoded against it.
    * The batch operator amortizes the greedy walk per DISTINCT word
    * via a vocabulary join; a stream cannot see "distinct words of
    * the corpus", so the twin walks per occurrence instead — which
    * makes it STATELESS (one row in, one row out, no shuffle, no
    * state store, Append-legal with any sink) and also total: a word
    * the training corpus never saw simply walks against the same
    * piece set and degrades to [UNK] exactly where batch re-training
    * would. Same kernel ([[graft.text.TextOps.greedyPieceCount]]),
    * same output schema, so batch and stream rows match one for one
    * on a shared corpus.
    */
  def streamingWordpieceEncode(
      docs: DataFrame, pieces: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(pieces.nonEmpty, "empty piece inventory")
    val spark = docs.sparkSession
    val vocab = pieces.toSet
    val maxCp = pieces.map(p => p.codePointCount(0, p.length)).max
    val bc = spark.sparkContext.broadcast((vocab, maxCp))
    // the document id keeps its SOURCE type (the batch twin's contract —
    // a string-keyed corpus must not null out through a forced long
    // cast), carried as a generic column through a row-encoded flatMap
    val outSchema = StructType(Seq(
      docs.schema(idCol).copy(name = idCol),
      StructField("n_words", LongType, nullable = false),
      StructField("n_wp_tokens", LongType, nullable = false),
      StructField("n_unk_words", LongType, nullable = false),
      StructField("wp_fertility", DoubleType, nullable = false)))
    docs.select(col(idCol), col(textCol))
      .flatMap { (row: org.apache.spark.sql.Row) =>
        val (v, mx) = bc.value
        val t = if (row.isNullAt(1)) "" else row.getString(1)
        // row-local equivalent of TextOps.tokens (split ' ', drop empties)
        val ws = t.split(" ").filter(_.nonEmpty)
        if (ws.isEmpty) Iterator.empty
        else {
          var nw = 0L; var nt = 0L; var unk = 0L
          ws.foreach { w =>
            val (c, u) = graft.text.TextOps.greedyPieceCount(w, v, mx)
            nw += 1; nt += c; unk += u
          }
          // HALF_UP to 6 decimals — the same rounding Spark's round()
          // applies in the batch operator (rint would be half-even)
          Iterator.single(org.apache.spark.sql.Row(row.get(0), nw, nt, unk,
            BigDecimal(nt * 1.0 / nw)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** STREAMING UNIGRAM-LM ENCODING — the deployment shape of
    * [[graft.text.UnigramOps.unigramEncodeFromVocab]]: the piece-cost
    * table is trained in batch (the artifact), arriving documents are
    * Viterbi-segmented against it per OCCURRENCE (a stream cannot see
    * "distinct words of the corpus"), which makes the twin STATELESS —
    * one row in, one row out, no shuffle, no state store, Append-legal
    * with any sink. Same packed-composite kernel
    * ([[graft.text.UnigramOps.viterbiSegment]]), same output schema
    * and id-type preservation as the wordpiece twin, so batch and
    * stream rows match one for one on a shared corpus. A word with a
    * character outside the trained alphabet fails loudly in BOTH twins
    * (the kernel's coverage guard) — character coverage is the trained
    * model's contract, not something a stream can silently relax.
    */
  def streamingUnigramEncode(
      docs: DataFrame, costs: Map[String, Long], maxPieceLen: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(costs.nonEmpty, "empty piece-cost table")
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(costs)
    val outSchema = StructType(Seq(
      docs.schema(idCol).copy(name = idCol),
      StructField("n_words", LongType, nullable = false),
      StructField("n_ug_tokens", LongType, nullable = false),
      StructField("ug_cost", LongType, nullable = false),
      StructField("ug_fertility", DoubleType, nullable = false)))
    docs.select(col(idCol), col(textCol))
      .flatMap { (row: org.apache.spark.sql.Row) =>
        val cm = bc.value
        val t = if (row.isNullAt(1)) "" else row.getString(1)
        val ws = t.split(" ").filter(_.nonEmpty)
        if (ws.isEmpty) Iterator.empty
        else {
          var nw = 0L; var nt = 0L; var cost = 0L
          ws.foreach { w =>
            val (_, packed) =
              graft.text.UnigramOps.viterbiSegment(w, cm, maxPieceLen)
            nw += 1; nt += packed % 2048L; cost += packed / 2048L
          }
          Iterator.single(org.apache.spark.sql.Row(row.get(0), nw, nt, cost,
            BigDecimal(nt * 1.0 / nw)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** STREAMING DEDUP-INDEX PROBE — the live half of the persisted-
    * index ingest pipeline ([[graft.io.DedupIndexIO]]): arriving
    * documents probe the corpus index AS THEY LAND, emitting
    * (id_a = incoming, id_b = indexed, bucket) near-dup CANDIDATES per
    * micro-batch. The signature/banding math is
    * [[graft.text.TextOps.rowLocalBandBuckets]] — a document's minhash
    * depends only on that document, so the whole probe is a NARROW map
    * + one stream-static equi-join against the bucket table: no
    * stateful aggregation, no watermark, no shuffle of the stream
    * beyond the join, which Structured Streaming executes per batch
    * with the static side loaded once. Exact Jaccard verification of
    * the candidates is the downstream batch step (the candidates are
    * already bucket-bounded); banding parameters come from the
    * sidecar, so a stream can never band differently than the index
    * it probes.
    */
  /** STREAMING SKETCH INGEST — the live half of the persisted HLL
    * store ([[graft.io.SketchIO]]): each arriving micro-batch is
    * sketched under the store's pinned parameters and its register
    * rows appended via `foreachBatch`. Structured Streaming's
    * `foreachBatch` is AT-LEAST-ONCE on failure/replay — and that is
    * EXACTLY the delivery guarantee this sink needs, because the
    * read-side max-merge is idempotent: a replayed batch re-appends
    * identical register rows that change no estimate. The
    * exactly-once engineering (transactional sinks, batch-id
    * bookkeeping) that most streaming aggregates require is made
    * unnecessary by the sketch's algebra, which is the whole reason a
    * 100 TB ingest pipeline ships registers instead of counts.
    */
  def streamingSketchIngest(
      spark: SparkSession, indexPath: String, incoming: DataFrame)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    graft.io.SketchIO.storedNgram(indexPath) // loud sidecar gate up front
    incoming.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.io.SketchIO.appendToSketch(batch, indexPath)
      }
      .start()
  }

  /** STREAMING MV MAINTENANCE — the live half of the persisted
    * materialized-aggregate state ([[graft.io.MvIO]]): each arriving
    * micro-batch of raw fact rows is aggregated to the per-key
    * distributive state and folded into the store by
    * [[graft.rel.RelOps.mergeDistributiveAgg]]'s algebra. The MV
    * state is ADDITIVE (a replayed delta would double-count), so
    * unlike the sketch ingest this sink cannot lean on idempotence —
    * it passes `foreachBatch`'s batch id through to
    * [[graft.io.MvIO.applyDelta]], whose commit-marker bookkeeping
    * turns at-least-once replay into exactly-once effect. Per batch
    * the work is delta-scan + keys-sized join; the base fact is never
    * rescanned, which is the whole point of the operator at 100 TB.
    *
    * Exactly-once depends on a DURABLE batch-id sequence: without a
    * checkpointLocation Spark allocates a fresh temporary checkpoint
    * on every (re)start and batch ids restart at 0, so every new
    * micro-batch with id <= the store's last committed id would be
    * misclassified as replay and SILENTLY dropped. So either pass
    * `checkpointLocation` (restart-safe — required in production), or
    * the store must be pristine (last committed batch id == -1, i.e.
    * fresh from [[graft.io.MvIO.createMv]]) and the query must never
    * restart; the pristine case is gated loudly up front.
    */
  def streamingMvMaintain(
      spark: SparkSession, mvPath: String, incoming: DataFrame,
      checkpointLocation: Option[String] = None)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    graft.io.MvIO.storedSchema(mvPath) // loud sidecar gate up front
    if (checkpointLocation.isEmpty) {
      val (_, lastBatch) = graft.io.MvIO.latestCommitted(mvPath)
      require(lastBatch == -1L,
        s"mv store $mvPath already committed batch $lastBatch; without a " +
          "durable checkpointLocation this stream's batch ids restart at 0 " +
          "and every micro-batch <= that id would be silently dropped as " +
          "replay — pass checkpointLocation to resume an advanced store")
    }
    val writer = incoming.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.io.MvIO.applyDelta(spark, mvPath, batch.toDF(), batchId)
        ()
      }
    checkpointLocation.fold(writer)(p => writer.option("checkpointLocation", p))
      .start()
  }

  /** STREAMING ANN-INDEX PROBE — the live half of the persisted IVF
    * pipeline ([[graft.io.AnnIndexIO]]), mirroring
    * [[streamingIndexProbe]]'s contract for vectors: query embeddings
    * probe the corpus index AS THEY ARRIVE. Quantization is row-local
    * (broadcast nlist-bounded centroids, the index's own quantizer —
    * argmax cosine, ties to the smaller centroid id, identical to the
    * batch probe), candidates come from ONE stream-static equi-join on
    * the list id, and scoring is a row-local cosine against the stored
    * rerank payload. No stateful aggregation, no watermark: the top-k
    * cut is the downstream batch step (candidates are already
    * nprobe·list-bounded per query), exactly as the dedup probe leaves
    * exact-verify downstream. StreamSpec pins that batch top-k over
    * the streamed candidates equals [[graft.io.AnnIndexIO.probeIndex]]
    * bit for bit.
    */
  def streamingAnnProbe(
      spark: SparkSession, indexPath: String, incoming: DataFrame,
      nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val centB = spark.sparkContext.broadcast(
      graft.io.AnnIndexIO.storedCentroids(spark, indexPath))
    val assign = spark.read.parquet(s"$indexPath/assign")
      .toDF("cand_id", "list")
    val stored = spark.read.parquet(s"$indexPath/vectors")
      .toDF("cand_id", "cv")
    val probes = incoming
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val cs = centB.value
        var nv = 0.0
        var d = 0
        while (d < v.length) { nv += v(d) * v(d); d += 1 }
        val normV = math.sqrt(nv)
        val sims = cs.map { case (cid, cv) =>
          var dot = 0.0; var nc = 0.0
          var i = 0
          val n = math.min(v.length, cv.length)
          while (i < n) { dot += v(i) * cv(i); nc += cv(i) * cv(i); i += 1 }
          (cid, dot / (normV * math.sqrt(nc)))
        }
        sims.sortBy { case (cid, s) => (-s, cid) }.take(nprobe)
          .map { case (cid, _) => (id, v, cid) }
      }.toDF("query_id", "qv", "list")
    probes.join(assign, "list")
      .filter(col("query_id") =!= col("cand_id"))
      .join(stored, "cand_id")
      .withColumn("sim",
        graft.vector.VectorOps.cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  def streamingIndexProbe(
      spark: SparkSession, indexPath: String, incoming: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (numHashes, bands) = graft.io.DedupIndexIO.storedParams(indexPath)
    val baseBuckets = spark.read.parquet(s"$indexPath/buckets")
      .toDF("id_b", "bucket")
    graft.text.TextOps.rowLocalBandBuckets(incoming, numHashes, bands, idCol, textCol)
      .toDF("id_a", "bucket")
      .join(baseBuckets, "bucket")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("bucket"))
  }

  /** STREAMING AUDIO-FINGERPRINT PROBE — the multimodal member of the
    * live-probe family ([[streamingIndexProbe]] for text,
    * [[streamingAnnProbe]] for vectors): clips are fingerprinted AS
    * THEY ARRIVE with the identical row-local band-energy kernel
    * ([[graft.multimodal.Multimodal.audioFingerprints]] — a stateless
    * mapPartitions, streaming-safe by construction), exploded through
    * the SAME [[graft.text.TextOps.hammingBands]] pigeonhole the
    * batch pair join uses (one definition — the stream can never band
    * differently), and candidates come from ONE stream-static
    * equi-join on (band, bits) against the stored corpus signatures.
    * The exact `bit_count` verify runs inline (row-local); the
    * multi-band candidate DEDUP is the downstream batch cut, exactly
    * as exact-verify is downstream of the text probe — `distinct` is
    * a stateful aggregation a probe stream must not own.
    *
    * OUTPUT CONTRACT — the ORIGINAL (id_a, id_b, hamming) column set
    * (band-multiplied rows, band NOT in the schema, so an existing
    * consumer's `distinct(id_a, id_b, hamming)` yields one row per
    * pair exactly as it always has). The banded diagnostic schema that
    * briefly replaced this one lives under
    * [[streamingAudioFpProbeBanded]] — adding `band` here silently
    * inflated any downstream plain-`distinct` pair count, a breaking
    * public-API change this split reverts.
    *
    * No state, no watermark: O(bucket occupancy) per arriving clip
    * against a 100 TB corpus index.
    */
  def streamingAudioFpProbe(
      baseSigs: DataFrame, incoming: Dataset[graft.multimodal.Multimodal.MediaRow],
      maxHamming: Int = 2): DataFrame =
    streamingAudioFpProbeBanded(baseSigs, incoming, maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))

  /** BANDED variant of [[streamingAudioFpProbe]]: identical candidate
    * stream with the matching pigeonhole `band` exposed per row (the
    * text probe's `bucket` column, same reason — which band fired is
    * the occupancy-skew diagnostic an index operator tunes on). A true
    * pair within the radius matches in up to `maxHamming + 1` bands
    * and is emitted once PER matching band: a consumer counting pairs
    * must cut to `distinct(id_a, id_b)` downstream; the multiplicity
    * is visible in the schema precisely so it cannot be mistaken for
    * one row per pair.
    */
  def streamingAudioFpProbeBanded(
      baseSigs: DataFrame, incoming: Dataset[graft.multimodal.Multimodal.MediaRow],
      maxHamming: Int = 2): DataFrame = {
    val probe = graft.text.TextOps.hammingBands(
        graft.multimodal.Multimodal.audioFingerprints(incoming).toDF("id", "sig"),
        sigBits = 64, maxHamming = maxHamming)
      .toDF("id_a", "sig_a", "band", "bits")
    val base = graft.text.TextOps.hammingBands(
        baseSigs.toDF("id", "sig"), sigBits = 64, maxHamming = maxHamming)
      .toDF("id_b", "sig_b", "band", "bits")
    probe.join(base, Seq("band", "bits"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("band"),
        expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** STREAMING VIDEO FRAME-HASH PROBE — the fourth member of the
    * live-probe family ([[streamingIndexProbe]] text,
    * [[streamingAnnProbe]] vectors, [[streamingAudioFpProbe]] audio):
    * arriving FRAME rows (doc_id, frame_idx, payload) are dHashed with
    * the identical row-local kernel
    * ([[graft.multimodal.Multimodal.frameHashes]] — stateless
    * mapPartitions), exploded through the SAME
    * [[graft.text.TextOps.hammingBands]] pigeonhole the batch pair
    * join uses, and candidates come from ONE stream-static equi-join
    * on (frame_idx, band, bits) against the stored corpus frame
    * signatures — temporally ALIGNED frames only, exactly the batch
    * [[graft.multimodal.Multimodal.videoNearDupPairs]] predicate. The
    * exact `bit_count` verify runs inline (row-local).
    *
    * OUTPUT CONTRACT — FRAME-level, BAND-MULTIPLIED candidates
    * (id_a = incoming video, id_b = indexed video, frame_idx, band,
    * hamming): the majority-quorum rollup `2·matched > min(nf)` is a
    * per-video-pair AGGREGATION — state a probe stream must not own —
    * and runs as the downstream batch cut, exactly as exact-verify is
    * downstream of the text probe and pair-dedup is downstream of the
    * audio probe. A consumer must roll up frames (distinct on
    * (id_a, id_b, frame_idx) first — the band multiplies) before
    * reading matches as video pairs.
    *
    * No state, no watermark: O(bucket occupancy) per arriving frame
    * against a 100 TB frame index.
    */
  /** STREAMING SHINGLE PROBE — the fifth live-probe member, completing
    * the probe matrix for the SHIFT-TOLERANT dedup family
    * ([[streamingVideoFpProbe]] covers aligned frame evidence; this
    * covers the head-cut re-upload that aligned matching misses by
    * construction): arriving CLIPS — one row per video,
    * (doc_id, sigs = the ordered frame-hash sequence), the unit a
    * finished upload presents — are w-shingled ROW-LOCALLY (the same
    * k-consecutive-hash grams as
    * [[graft.multimodal.Multimodal.sequenceShinglePairs]], distinct
    * per clip), and candidates come from ONE stream-static equi-join
    * on the gram against the stored corpus gram index
    * ([[graft.multimodal.Multimodal.sequenceGramIndex]]). Works
    * unchanged for audio: sigs = the 64-sample window-energy sequence.
    *
    * OUTPUT CONTRACT — GRAM-multiplied candidate pairs (id_a =
    * incoming clip, id_b = indexed clip, g = the shared gram): a true
    * shifted duplicate matches once PER shared gram, and the quorum
    * rollup `2·n_shared > min(ng)` is a per-pair AGGREGATION — state a
    * probe stream must not own — so it runs as the downstream batch
    * cut, exactly as pair-dedup is downstream of the audio probe. The
    * gram rides in the schema so the multiplicity cannot be mistaken
    * for one row per pair.
    *
    * No state, no watermark: clips shorter than k frames emit nothing
    * (no gram exists); cost is O(gram-bucket occupancy) per arriving
    * clip against a 100 TB gram index.
    */
  def streamingShingleProbe(
      baseGrams: DataFrame, incoming: DataFrame, k: Int = 2): DataFrame = {
    require(k >= 2, s"shingle length must be >= 2, got $k")
    val probe = incoming.toDF("id_a", "sigs")
      .filter(size(col("sigs")) >= k)
      .select(col("id_a"),
        explode(array_distinct(expr(
          s"transform(sequence(1, size(sigs) - ${k - 1}), i -> slice(sigs, i, $k))")))
          .as("g"))
    probe.join(baseGrams.toDF("id_b", "g"), Seq("g"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("g"))
  }

  def streamingVideoFpProbe(
      baseFrameSigs: DataFrame, incoming: DataFrame,
      maxHamming: Int = 2): DataFrame = {
    def banded(sigs: DataFrame, idAs: String, sigAs: String): DataFrame =
      graft.text.TextOps.hammingBands(
          sigs.toDF("vid", "f", "sig")
            .select(org.apache.spark.sql.functions.struct(col("vid"), col("f")).as("id"),
              col("sig")),
          sigBits = 64, maxHamming = maxHamming)
        .select(col("id.vid").as(idAs), col("id.f").as("frame_idx"),
          col("sig").as(sigAs), col("band"), col("bits"))
    val probe = banded(
      graft.multimodal.Multimodal.frameHashes(incoming), "id_a", "sig_a")
    val base = banded(baseFrameSigs, "id_b", "sig_b")
    probe.join(base, Seq("frame_idx", "band", "bits"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("frame_idx"), col("band"),
        expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
