package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** TEMPORAL event-stream operators over the `events` table —
  * sessionization and as-of correlation, the two event-log primitives
  * Spark's built-in operator set lacks as first-class joins. Both are
  * expressed as per-user window plans: ONE hash shuffle on the user
  * key, per-user sorted frames bounded by a single user's history —
  * the shape that scales linearly with users at 100 TB (and the same
  * shape Structured Streaming state partitioning uses, so the batch
  * semantics carry over to streams).
  *
  * Timestamps are plain int64 ticks in whatever unit the caller
  * standardized on (the harness uses integer microseconds — the
  * precision every engine in the compare can represent), so every
  * comparison and difference here is integer-exact — no calendar
  * arithmetic, no rounding.
  */
object EventOps {

  /** SCHEMA-ADAPTIVE tick normalization: the `events` table has shipped
    * `ts` as int64 nanoseconds (parquet TIMESTAMP(NANOS) surfaced as a
    * long via `spark.sql.legacy.parquet.nanosAsLong`) and as parquet
    * timestamp[us] (surfaced as TIMESTAMP or TIMESTAMP_NTZ depending on
    * isAdjustedToUTC / `inferTimestampNTZ`). Every operator below wants
    * one thing: plain int64 MICROSECOND ticks, the precision every
    * engine in the cross-check can represent exactly. This adapter
    * inspects the physical type once (driver-side schema lookup, no
    * action) and rewrites the column; unknown types fail loudly rather
    * than silently producing seconds (a bare `cast("long")` on a
    * timestamp would). NTZ→timestamp is wall-clock-preserving under the
    * harness's UTC session timezone.
    *
    * NOT IDEMPOTENT: a LongType `ts` is BY CONTRACT int64 nanoseconds
    * (the raw-parquet shape) — a frame already normalized to long
    * micros is type-indistinguishable from it, and re-applying the
    * adapter would silently divide again, yielding millisecond ticks.
    * Normalize exactly once, at the read boundary; everything in this
    * object and [[graft.streaming.StreamOps]] takes micros from there
    * on and never calls the adapter internally.
    */
  def toMicros(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        events.withColumn(tsCol, expr(s"$tsCol div 1000")) // int64 nanos
      case org.apache.spark.sql.types.TimestampType =>
        events.withColumn(tsCol, unix_micros(col(tsCol)))
      case org.apache.spark.sql.types.TimestampNTZType =>
        events.withColumn(tsCol, unix_micros(col(tsCol).cast("timestamp")))
      case other =>
        throw new IllegalArgumentException(
          s"events.$tsCol: expected int64 nanos or a timestamp type, got $other")
    }

  /** GAP-BASED SESSIONIZATION: a user's events, ordered by time, split
    * into sessions wherever the gap to the previous event exceeds
    * `gap` (in the ts column's own units); per session, the count / span / value sum a funnel or
    * engagement pipeline consumes.
    *
    * Two stacked windows over the same (user, ts, id) order — lag to
    * flag session starts, running sum to number them — then one
    * groupBy. Catalyst plans the two windows into a single sort over a
    * single exchange, and the session aggregate reuses the same
    * partitioning (`event_id` breaks ordering ties so the numbering is
    * deterministic under equal timestamps).
    */
  def sessionize(
      events: DataFrame, gap: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    val order = W.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val running = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col(tsCol) - col("prev_ts") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(running) - 1)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("sum_value"))
  }

  /** AS-OF JOIN (event-type form): for every event of `leftType`, the
    * most recent `rightType` event by the SAME user at or strictly
    * before it — "which click led to this purchase". Spark has no asof
    * join; the naive inequality join explodes to a per-user cross
    * product and then filters. This plan never forms a pair: both
    * sides union into one stream, ONE window per user carries the
    * latest right-side attributes forward (`last(..., ignoreNulls)`
    * over an unbounded-preceding frame), and the left rows read them
    * off — cost is one shuffle plus a per-user sort, independent of
    * how many right events precede each left event.
    *
    * At equal timestamps the right side sorts first (tag 0 < tag 1),
    * so a left event sees a same-instant right event — the `<=`
    * convention, matching a SQL engine's `ASOF JOIN ON l.ts >= r.ts`.
    * Unmatched left events keep null right columns (left semantics).
    * The streaming twin is
    * [[graft.streaming.StreamOps.streamingAsofLatest]] (custom
    * watermark-finalized state — stream-stream joins need a two-sided
    * time bound, which as-of lacks); StreamSpec pins batch == stream
    * probe for probe.
    */
  def asofLatest(
      events: DataFrame, leftType: String, rightType: String,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val base = events.select(
      col(idCol), col(userCol), col(tsCol), col(typeCol), col(valueCol))
    val tagged = base.filter(col(typeCol) === leftType).withColumn("tag", lit(1))
      .unionByName(base.filter(col(typeCol) === rightType).withColumn("tag", lit(0)))
    val frame = W.partitionBy(col(userCol))
      .orderBy(col(tsCol), col("tag"), col(idCol))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    // ONE struct carried with a single last(ignoreNulls): carrying each
    // column independently would, when the newest right event has a
    // NULL value, splice that column from an OLDER event — a frankenrow
    // matching no actual event. The struct is non-null whenever the row
    // is a right event, so all b_* fields come from the same event.
    val carried = last(
      when(col("tag") === 0, struct(col(idCol), col(tsCol), col(valueCol))),
      ignoreNulls = true).over(frame)
    tagged
      .withColumn("b", carried)
      .filter(col("tag") === 1)
      .select(col(idCol), col(userCol), col(tsCol),
        col("b")(idCol).as("b_event_id"),
        col("b")(tsCol).as("b_ts"),
        col("b")(valueCol).as("b_value"))
  }

  /** DIRECTED AS-OF JOIN WITH TOLERANCE — the full pandas
    * `merge_asof(direction=, tolerance=)` surface Spark lacks
    * natively: each `leftType` event matched to the NEAREST same-user
    * `rightType` event at-or-after it (`forward = true`; the
    * post-event attribution question "which click followed this
    * purchase") or at-or-before it (`forward = false`,
    * [[asofLatest]]'s direction), with matches farther than
    * `toleranceUs` nulled out — left rows always survive.
    *
    * Same scalable shape as [[asofLatest]]: ONE user-keyed window
    * over the tagged union carries the nearest right event as a
    * single struct (never spliced per-column), so cost is one
    * user-partitioned sort — no corpus×corpus join, no driver-side
    * anything. Tie discipline: at equal timestamps the right event
    * COUNTS as a match in both directions (inclusive comparison, the
    * ASOF-join convention), and among equal right timestamps the
    * smallest event id wins.
    *
    * Returns (event_id, user_id, ts, b_event_id, b_ts, b_value,
    * lag_us) with lag_us = |b_ts − ts|, all b_* NULL when no match
    * lies within tolerance.
    */
  def asofNearest(
      events: DataFrame, leftType: String, rightType: String,
      forward: Boolean, toleranceUs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    require(toleranceUs > 0, s"tolerance must be positive, got $toleranceUs")
    val base = events.select(
      col(idCol), col(userCol), col(tsCol), col(typeCol), col(valueCol))
    val tagged = base.filter(col(typeCol) === leftType).withColumn("tag", lit(1))
      .unionByName(base.filter(col(typeCol) === rightType).withColumn("tag", lit(0)))
    // forward: left rows sort BEFORE same-ts right rows (tag desc) and
    // the frame looks ahead; backward: mirror image
    val frame =
      if (forward)
        W.partitionBy(col(userCol))
          .orderBy(col(tsCol), col("tag").desc, col(idCol))
          .rowsBetween(W.currentRow, W.unboundedFollowing)
      else
        // id DESC so `last()` lands on the SMALLEST right id among
        // equal timestamps — same tie rule as the forward direction's
        // first() over id asc; tag asc keeps same-ts right rows
        // inside the left row's trailing frame (inclusive match)
        W.partitionBy(col(userCol))
          .orderBy(col(tsCol), col("tag"), col(idCol).desc)
          .rowsBetween(W.unboundedPreceding, W.currentRow)
    val carriedExpr =
      when(col("tag") === 0, struct(col(idCol), col(tsCol), col(valueCol)))
    val carried =
      if (forward) first(carriedExpr, ignoreNulls = true).over(frame)
      else last(carriedExpr, ignoreNulls = true).over(frame)
    tagged
      .withColumn("b0", carried)
      .filter(col("tag") === 1)
      .withColumn("b",
        when(abs(col("b0")(tsCol) - col(tsCol)) <= toleranceUs, col("b0")))
      .select(col(idCol), col(userCol), col(tsCol),
        col("b")(idCol).as("b_event_id"),
        col("b")(tsCol).as("b_ts"),
        col("b")(valueCol).as("b_value"),
        abs(col("b")(tsCol) - col(tsCol)).as("lag_us"))
  }

  /** INTERVAL JOIN (batch form): every `leftType` event paired with
    * ALL the same user's `rightType` events in the trailing `window`
    * ticks — the attribution-window join ("purchases with the clicks
    * of the preceding hour"), where [[asofLatest]] keeps only the
    * newest one. The user equi-key bounds the match set per user;
    * Spark plans the range condition as a post-join filter on the
    * user-partitioned join, so cost is per-user pair counts, never
    * corpus x corpus. The streaming twin is
    * [[graft.streaming.StreamOps.streamingIntervalJoin]], whose
    * watermark + time-bound state eviction runs the same semantics
    * unbounded; StreamSpec pins batch == stream row for row.
    */
  def intervalJoin(
      events: DataFrame, leftType: String, rightType: String, window: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val l = events.filter(col(typeCol) === leftType)
      .select(col(idCol).as("l_event_id"), col(userCol),
        col(tsCol).as("l_ts"), col(valueCol).as("l_value"))
    val r = events.filter(col(typeCol) === rightType)
      .select(col(idCol).as("r_event_id"), col(userCol).as("r_user"),
        col(tsCol).as("r_ts"), col(valueCol).as("r_value"))
    l.join(r,
      col(userCol) === col("r_user") &&
        col("r_ts") <= col("l_ts") && col("r_ts") >= col("l_ts") - window)
      .select(col("l_event_id"), col(userCol), col("l_ts"),
        col("r_event_id"), col("r_ts"), col("r_value"))
  }

  /** TIME-SERIES REGULARIZATION — the temporal analog of raster
    * resampling: each user's irregular event stream becomes a regular
    * grid of `step`-tick samples carrying the LAST observed value at
    * or before each tick (forward fill), from the first tick >= the
    * user's first event through the user's last event. The plan is
    * the as-of union-tag shape again: per-user tick rows are GENERATED
    * distributedly (`sequence` + explode from each user's min/max —
    * never a driver loop), unioned with the real events, and ONE
    * per-user window carries the latest value forward onto the ticks —
    * one shuffle on the user key, cost linear in events + ticks, no
    * per-tick point lookups.
    *
    * Returns (user, tick_ts, value, n_obs) where n_obs counts the real
    * events in the tick's lookback window (tick - step, tick] — 0 for
    * pure carry-forward ticks.
    */
  def resampleEvents(
      events: DataFrame, step: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(step >= 1, s"step must be >= 1 tick, got $step")
    // per-user tick grid: first multiple of step >= min(ts), through
    // max(ts) — integer arithmetic (a double ceil would wobble at
    // 2^53-scale tick values); users whose single event misses the
    // grid entirely produce no ticks (filter, not an empty-sequence
    // error)
    val firstTick = expr(s"((t0 + $step - 1) div $step) * $step")
    val bounds = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t0"), max(col(tsCol)).as("t1"))
      .withColumn("ft", firstTick)
      .filter(col("ft") <= col("t1"))
    val ticks = bounds.select(col(userCol),
        explode(sequence(col("ft"), col("t1"), lit(step))).as(tsCol))
      .withColumn("is_tick", lit(1))
      .withColumn("eid", lit(null).cast("long"))
      .withColumn("v", lit(null).cast("double"))
    val obs = events.select(col(userCol), col(tsCol),
        col(idCol).cast("long").as("eid"),
        col(valueCol).cast("double").as("v"))
      .withColumn("is_tick", lit(0))
    // ticks sort AFTER same-instant events (tick 1 > event 0), so a
    // tick at an event's exact timestamp sees that event's value;
    // event_id makes the carry deterministic under equal timestamps
    val carryOrder = W.partitionBy(col(userCol))
      .orderBy(col(tsCol), col("is_tick"), col("eid"))
    val carryFrame = carryOrder.rowsBetween(W.unboundedPreceding, W.currentRow)
    // RANGE frames take ONE numeric sort key; peers at the same ts all
    // enter the frame, so the tick/event tie needs no second key here
    val lookback = W.partitionBy(col(userCol)).orderBy(col(tsCol))
      .rangeBetween(-(step - 1), 0)
    obs.unionByName(ticks)
      .withColumn("carried", last(when(col("is_tick") === 0, col("v")),
        ignoreNulls = true).over(carryFrame))
      .withColumn("n_obs", count(when(col("is_tick") === 0, lit(1))).over(lookback))
      .filter(col("is_tick") === 1)
      .select(col(userCol), col(tsCol).as("tick_ts"),
        col("carried").as("value"), col("n_obs"))
  }

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` payload and aggregate — the "parse the logging sidecar"
    * pass. `get_json_object` is a codegen'd path expression; the whole
    * query is scan → narrow extract → one partial-aggregated groupBy.
    */
  def jsonFieldStats(
      events: DataFrame, path: String = "$.k",
      typeCol: String = "event_type", propsCol: String = "props"): DataFrame =
    events
      .select(col(typeCol), get_json_object(col(propsCol), path).cast("long").as("k"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Retention cohorts: users are cohorted by the bucket of their
    * FIRST `anchorType` event (e.g. signup week); for each cohort and
    * offset k, the fraction of the cohort with ANY activity k buckets
    * later. The companion report to [[funnel]] — activation tells you
    * who converted, retention tells you who stayed.
    *
    * All bucket math is integral `DIV` on the raw ticks, so cohort
    * keys and offsets are bit-stable. Three aggregations, all keyed
    * (user, then (user,bucket) distinct, then (cohort,offset)) — no
    * windows, no per-user arrays; a power user contributes at most
    * `maxOffset + 1` distinct activity rows past the dedup.
    *
    * Returns (cohort_bucket, k, n_active, n_cohort, retention); k = 0
    * rows are the cohort definition itself (retention 1.0 whenever the
    * anchor event is also activity, which it is here).
    */
  def retentionCohorts(
      events: DataFrame, anchorType: String, bucket: Long, maxOffset: Int,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(bucket > 0 && maxOffset >= 0, s"bad params: bucket=$bucket maxOffset=$maxOffset")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).cast("long").as("ts"))
    val cohort = ev.filter(col("t") === anchorType)
      .groupBy(col("u")).agg(expr(s"min(ts) DIV $bucket").as("cb"))
    val act = ev.select(col("u"), expr(s"ts DIV $bucket").as("w")).distinct()
    val sizes = cohort.groupBy(col("cb")).agg(count(lit(1)).as("n_cohort"))
    act.join(cohort, "u")
      .withColumn("k", col("w") - col("cb"))
      .filter(col("k") >= 0 && col("k") <= maxOffset)
      .groupBy(col("cb"), col("k")).agg(count(lit(1)).as("n_active"))
      .join(sizes, "cb")
      .select(col("cb").as("cohort_bucket"), col("k"), col("n_active"), col("n_cohort"),
        round(col("n_active") * lit(1.0) / col("n_cohort"), 6).as("retention"))
  }

  /** EVENT-MIX DRIFT between consecutive time buckets: the event-type
    * distribution of each `bucket`-tick window compared (Jensen-
    * Shannon, base e) against the PREVIOUS window's — the live
    * monitoring number that flags "the traffic mix just changed"
    * (bot floods, instrument dropouts) before downstream counts do.
    *
    * Same integer determinism contract as
    * [[graft.text.CorpusOps.sourceDrift]]: each per-type summand is
    * one fixed double expression floored into 1e-12 units, so sums
    * are order-free and bit-identical across engines. Plan: one
    * (bucket, type) count aggregation, a self equi-join stepping
    * bucket k onto k-1 (full outer per type inside the pair), one
    * keyed sum — everything hash-partitioned, nothing windowed.
    *
    * Returns (bucket_id, n_types, js_e12) for every bucket with a
    * predecessor bucket present in the data.
    */
  def eventTypeDrift(
      events: DataFrame, bucket: Long,
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val counts = events
      .select(expr(s"$tsCol div $bucket").as("b"), col(typeCol).as("t"))
      .groupBy(col("b"), col("t")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("b")).agg(sum(col("c")).as("n"))
    val prev = counts.select((col("b") + 1).as("b"), col("t"), col("c").as("c_prev"))
    val prevTot = totals.select((col("b") + 1).as("b"), col("n").as("n_prev"))
    val joined = counts.withColumnRenamed("c", "c_cur")
      .join(prev, Seq("b", "t"), "full_outer")
      .select(col("b"), col("t"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"),
        coalesce(col("c_prev"), lit(0L)).as("c_prev"))
    val p = col("c_prev") * lit(1.0) / col("n_prev")
    val q = col("c_cur") * lit(1.0) / col("n")
    val m = (p + q) / lit(2.0)
    // same ln-ulp caveat as CorpusOps.sourceDrift: the floored 1e-12
    // units are deterministic per engine, cross-engine only to ±1 unit
    // per term (ln is not correctly rounded in either libm)
    val term = floor(
      (when(col("c_prev") > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
        when(col("c_cur") > 0, lit(0.5) * q * log(q / m)).otherwise(lit(0.0))) *
        lit(1e12)).cast("long")
    joined.join(totals, Seq("b")).join(prevTot, Seq("b"))
      .select(col("b"), term.as("term"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_types"), sum(col("term")).as("js_e12"))
      .select(col("b").as("bucket_id"), col("n_types"), col("js_e12"))
  }

  /** EVENT-RATE ANOMALY DETECTION — the robust-outlier contract
    * ([[graft.text.CorpusOps.robustOutliers]]) applied to RATES: per
    * event type, bucket the stream, take the exact median and MAD of
    * the per-bucket counts, and flag buckets whose Iglewicz-Hoaglin
    * modified z exceeds `cut` — the pager rule for "this event type
    * spiked / went dark this interval".
    *
    * Buckets with NO events are materialized as zero-count rows over
    * the [min, max] bucket range (a dead stream is the anomaly that
    * matters most, and a median over only the present buckets would
    * mask it) — the densification is a types × range frame from ONE
    * 1-row min/max aggregate, never a scan. Counts are exact longs;
    * median/MAD interpolate only at even counts where (a+b)/2 on
    * integers is an exact double in both engines; z follows the
    * robustOutliers rounding contract.
    *
    * Plan shape: one map-side-combined count to (type, bucket) grain,
    * two tiny percentile aggregations over the bucket frame (range ×
    * types rows, NOT events), one broadcast join back. Nothing
    * event-sized shuffles twice.
    *
    * Returns (event_type, bucket_id, c, med, mad, z, is_anomaly).
    */
  /** The COUNT stage of [[rateAnomaly]] alone — (t, b, c) per type and
    * bucket. Split out because groupBy+count is STREAMING-LEGAL: the
    * same expression tree over a `readStream` source in Complete mode
    * is the live rate monitor whose output converges to the batch
    * counts (StreamSpec pins the parity), so the anomaly gate's input
    * is watchable while events arrive — the median/MAD cut itself
    * stays a batch pass over the types × range frame.
    */
  def eventRateCounts(
      events: DataFrame, bucket: Long,
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    events
      .select(expr(s"$tsCol div $bucket").as("b"), col(typeCol).as("t"))
      .groupBy(col("t"), col("b")).agg(count(lit(1)).as("c"))
  }

  def rateAnomaly(
      events: DataFrame, bucket: Long, cut: Double = 3.5,
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(cut > 0, s"cut must be positive, got $cut")
    val counts = eventRateCounts(events, bucket, typeCol, tsCol)
    val range = counts.agg(min(col("b")).as("b_lo"), max(col("b")).as("b_hi"))
    val frame = counts.select(col("t")).distinct()
      .crossJoin(broadcast(range))
      .select(col("t"), explode(expr("sequence(b_lo, b_hi)")).as("b"))
    val dense = frame.join(counts, Seq("t", "b"), "left")
      .select(col("t"), col("b"),
        coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("x", col("c").cast("double"))
    val med = dense.groupBy(col("t"))
      .agg(expr("percentile(x, 0.5d)").as("med"))
      .withColumnRenamed("t", "_t")
    val withMed = dense.join(broadcast(med), col("t") === col("_t")).drop("_t")
    val mad = withMed.withColumn("adev", abs(col("x") - col("med")))
      .groupBy(col("t"))
      .agg(expr("percentile(adev, 0.5d)").as("mad"))
      .withColumnRenamed("t", "_t")
    withMed.join(broadcast(mad), col("t") === col("_t")).drop("_t")
      .withColumn("z",
        when(col("mad") > 0,
          round(lit(0.6745) * (col("x") - col("med")) / col("mad"), 6))
          .otherwise(lit(0.0)))
      .select(col("t").as(typeCol), col("b").as("bucket_id"), col("c"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        col("z"), (abs(col("z")) > cut).as("is_anomaly"))
  }

  /** Ordered funnel: how many users complete step 1, then step 2
    * strictly after it within `within` ticks of it, then step 3
    * relative to step 2, and so on — EARLIEST-completion semantics
    * (each step binds to the MIN qualifying timestamp given the
    * previous step's bound time), the standard greedy funnel of the
    * product-analytics engines.
    *
    * Plan shape: one pass per step over ONLY that step's events —
    * `filter(type = step)` prunes at the scan — joined to the previous
    * step's one-row-per-user table on the user key and re-minimized.
    * Every intermediate is at most one row per user, every comparison
    * is integer tick arithmetic (no calendar math, no floats until the
    * final conversion ratio), so results are bit-stable under any
    * partitioning. At 100 TB this is k hash-joins on user_id over
    * step-pruned scans — the funnel never materializes per-user event
    * arrays the way collect_list approaches do, so a power user with
    * millions of events costs the same as anyone else past the scan.
    *
    * Returns (step_idx, step, n_users, conv) — conv is the fraction of
    * step-1 completers still present, rounded to 6.
    */
  def funnel(
      events: DataFrame, steps: Seq[String], within: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(within > 0, s"within must be positive, got $within")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).cast("long").as("ts"))
    var cur = ev.filter(col("t") === steps.head)
      .groupBy(col("u")).agg(min(col("ts")).as("tprev"))
    var acc = cur.select(lit(0).as("step_idx"), col("u"))
    for ((s, i) <- steps.tail.zipWithIndex) {
      cur = ev.filter(col("t") === s).as("e")
        .join(cur.as("p"), col("e.u") === col("p.u"))
        .filter(col("e.ts") > col("tprev") && col("e.ts") - col("tprev") <= within)
        .groupBy(col("e.u").as("u")).agg(min(col("e.ts")).as("tprev"))
      acc = acc.unionByName(cur.select(lit(i + 1).as("step_idx"), col("u")))
    }
    val perStep = acc.groupBy(col("step_idx")).agg(count(lit(1)).as("n_users"))
    val names = events.sparkSession.createDataFrame(
      steps.zipWithIndex.map { case (s, i) => (i, s) }).toDF("step_idx", "step")
    val first = perStep.filter(col("step_idx") === 0)
      .select(col("n_users").as("n_first"))
    // LEFT from the step list so a step nobody reached reports 0, not
    // a silently missing row. The hint must sit on perStep: Spark
    // cannot build the stream-preserved left side of a left-outer
    // join, and a hint there is silently dropped (HintErrorLogger).
    names.join(broadcast(perStep), Seq("step_idx"), "left")
      .na.fill(0L, Seq("n_users"))
      .crossJoin(broadcast(first))
      .select(col("step_idx"), col("step"), col("n_users"),
        round(col("n_users") * lit(1.0) / col("n_first"), 6).as("conv"))
  }

  /** RETRANSMISSION REPORT — the stream-hygiene gate an event
    * pipeline runs before anything aggregates: an event identical to
    * the SAME user's previous event of the same type and value within
    * `toleranceUs` is a duplicate delivery (client retry, at-least-
    * once producer), and counting it as signal corrupts every rate
    * and funnel downstream. Detection is one lag comparison inside a
    * (user, type, value)-keyed window — keyed, so the sort
    * parallelizes per group; nothing corpus-wide. The per-type rollup
    * reports the duplicate share in integer ppm (no double in the
    * face).
    *
    * Returns (event_type, n_events, n_retrans, retrans_ppm).
    */
  def retransmissionStats(
      events: DataFrame, toleranceUs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    require(toleranceUs > 0, s"tolerance must be positive, got $toleranceUs")
    val w = W.partitionBy(col(userCol), col(typeCol), col(valueCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .select(col(idCol), col(userCol), col(tsCol), col(typeCol), col(valueCol))
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("is_retrans",
        col("prev_ts").isNotNull && col(tsCol) - col("prev_ts") <= toleranceUs)
      .groupBy(col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_retrans"), 1L).otherwise(0L)).as("n_retrans"))
      .withColumn("retrans_ppm", expr("(n_retrans * 1000000) div n_events"))
      .orderBy(col("event_type"))
  }

  /** K-ANONYMITY REPORT over a quasi-identifier column set (Sweeney
    * 2002) — the privacy gate a training-data release runs before
    * shipping event-derived features: rows whose QI combination is
    * shared by fewer than k records are re-identifiable by linkage,
    * so the report counts the equivalence classes and the row mass
    * below the threshold. A release policy then drops or generalizes
    * exactly that mass.
    *
    * Shape at 100 TB: ONE map-side-combined aggregation to QI-class
    * grain, then one bounded aggregation over the class histogram —
    * the key-skew-report shape; no window, no second scan. All counts
    * exact longs; the below-k share is reported in integer ppm
    * (truncating div — both engines' integer division agrees on
    * non-negative operands), so the one-row face carries no double.
    *
    * Returns one row: (n_rows, n_classes, min_class, max_class,
    * n_classes_below_k, n_rows_below_k, below_k_ppm).
    */
  def kAnonymityReport(events: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one QI column")
    kAnonymityFromClasses(qiClassCounts(events, qiCols), k)
  }

  /** The report's stage 1 — QI equivalence-class counts. A plain
    * keyed count, so it is STREAMING-LEGAL as-is (complete/update
    * mode): the live privacy monitor runs this over the stream and
    * derives the report batch-side from the sink, the
    * eventRateCounts split. StreamSpec pins stream == batch.
    */
  def qiClassCounts(events: DataFrame, qiCols: Seq[String]): DataFrame =
    events.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("cnt"))

  /** The report's stage 2 — the bounded histogram fold over a
    * [[qiClassCounts]] table (however it was produced).
    */
  def kAnonymityFromClasses(classes: DataFrame, k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    classes.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("cnt")).as("min_class"),
        max(col("cnt")).as("max_class"),
        sum(when(col("cnt") < k, 1L).otherwise(0L)).as("n_classes_below_k"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(0L)).as("n_rows_below_k"))
      .select(col("n_rows"), col("n_classes"), col("min_class"),
        col("max_class"), col("n_classes_below_k"), col("n_rows_below_k"),
        expr("(n_rows_below_k * 1000000) div n_rows").as("below_k_ppm"))
  }
}
