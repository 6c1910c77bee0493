package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators over the `events` table shape
  * (event_id, user_id, event_type, value, ts).
  *
  * The reference has no streaming (SURVEY §2.8) — this is the
  * north-star extension the engine needs at 100 TB: the same
  * declarative plans run incrementally. Both operators are written
  * against DataFrames/Datasets so they execute identically in batch
  * (`q15_time_bucket` is the batch twin of `hourlyAgg`) and as a
  * `readStream` source with watermark-bounded state.
  *
  * Scale: windowed aggregation state is (window × event_type) — tiny;
  * the watermark bounds it. Sessionization state is per-user and
  * evicted by event-time timeout, so state size tracks ACTIVE users,
  * not history. Both shuffle once on their grouping key.
  */
object EventStream {

  final case class Event(event_id: Long, user_id: Long, event_type: String,
                         value: Double, ts: Timestamp)

  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Int, total_value: Double)

  // public: the state encoder's generated code instantiates it.
  // `totalScaled` carries the session value sum in EXACT 10^-4 units
  // (the DECIMAL(18,4) device sessionWindows sums with) — a raw
  // running double would be order-dependent and diverge from the
  // built-in twin on >4-decimal values (round-18 review).
  final case class SessionState(start: Long, last: Long, n: Int,
                                totalScaled: Long)

  final case class Transition(user_id: Long, from_type: String,
                              to_type: String, ts: Timestamp)

  final case class LastEvent(ts: Long, event_id: Long, event_type: String)

  final case class Trending(window_start: Timestamp, event_type: String,
                            n_events: Long, rank: Int)
  // per-window accumulator: event_type -> count
  final case class TrendState(counts: Map[String, Long])

  /** Event-time hourly aggregate per event type — the streaming twin of
    * q15 (same grouping, same exact-decimal sums). On a stream the
    * watermark closes windows `delay` after their end; in batch the
    * watermark is a no-op and results equal the relational query.
    */
  def hourlyAgg(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    val D = DecimalType(18, 4)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("win.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("approx_users"))
  }

  /** Per-day OHLC downsample — the streaming twin of q102. Open/close
    * are the ORDER-based aggregates (first/last value under the
    * (ts, event_id) total order); on a stream a rank window is
    * unavailable, but `min_by`/`max_by` keyed on the struct(ts,
    * event_id) total order compute the identical rows incrementally —
    * tie-safe because the order is total, and commutative across
    * micro-batches, so arrival order never matters (unlike first()/
    * last(), which are batch-order-dependent and wrong here). State
    * per (day, type) group is one fixed-size OHLC cell, closed by the
    * watermark; in batch the watermark is a no-op and the result
    * equals q102 row-for-row (EventStreamSpec pins both).
    */
  def ohlc(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    val D = DecimalType(18, 4)
    val orderKey = struct(col("ts"), col("event_id"))
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(
        min_by(col("value"), orderKey).as("open"),
        max_by(col("value"), orderKey).as("close"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        sum(col("value").cast(D)).cast("double").as("sum_value"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        date_format(col("win.start"), "yyyy-MM-dd").as("day"),
        col("open"), col("close"), col("high"), col("low"),
        col("sum_value"), col("n_events"))
  }

  /** Per-window HLL sketch table — the streaming PRODUCER of q59's
    * pre-aggregate: each watermark-closed window emits (window_start,
    * event_type, user_sketch) where the sketch is the mergeable HLL
    * register blob, not an estimate. Any time-range's distinct-user
    * count is then a tiny batch `hll_union_agg` over the stored
    * sketches (EventStreamSpec proves the round trip) — the event
    * stream is scanned once, ever, and re-aggregation to any coarser
    * granularity never revisits it. State per (window, type) group is
    * one ~KB sketch, bounded by the watermark.
    */
  def userSketches(events: DataFrame, windowMinutes: Int = 60,
                   watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$windowMinutes minutes").as("win"),
        col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("user_sketch"))

  /** Per-window value-histogram rows — the streaming PRODUCER of
    * q64's quantile pre-aggregate, `userSketches`' sibling for
    * percentiles: each watermark-closed window emits
    * `(window_start, event_type, bin, n)` rows under the same
    * deterministic (lo, hi, bins) grid the batch
    * `operators.QuantileSketch` uses (shared `binExpr`). Appended rows
    * merge by integer SUM per (group, bin) — so any time-range's
    * percentiles come from `QuantileSketch.percentilesFromBins` over
    * the stored rows, bit-identical to a batch histogram over the same
    * events (EventStreamSpec proves the agreement); the event stream
    * is scanned once, ever. State per (window, type) group is at most
    * `bins` counters, bounded by the watermark.
    */
  def valueHistograms(events: DataFrame, lo: Double, hi: Double,
                      bins: Int = 256, windowMinutes: Int = 60,
                      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      // null values excluded — the QuantileSketch.histogram convention
      // (a null would otherwise clamp into bin 0 as a lo-valued row)
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), s"$windowMinutes minutes").as("win"),
        col("event_type"),
        graft.operators.QuantileSketch.binExpr(col("value"), lo, hi, bins).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("bin"), col("n"))

  /** Streaming exact dedup by event id with watermark-bounded state:
    * duplicates arriving within `watermarkDelay` of the original are
    * dropped; state for ids older than the watermark is evicted, so
    * memory tracks the delay window, not the stream's history — the
    * streaming twin of the batch pipeline's exact dedup pass.
    */
  def dedupEvents(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming windowed THROTTLE — q87's batch rule run incrementally:
    * at most one event per (user, type, `bucketSeconds` bucket)
    * passes; later arrivals for an already-seen bucket drop. The
    * semantics are PER-ARRIVAL-ORDER: the kept row is the first to
    * reach the dedup state (what alert/metering dedup wants), which
    * matches q87's (ts, event_id)-minimal set only when arrival order
    * tracks event order all the way into the operator — ACROSS
    * micro-batches that means an in-order source, and WITHIN one
    * micro-batch it additionally needs a single input partition,
    * because dropDuplicatesWithinWatermark keeps the first row per key
    * in post-shuffle partition order (true for the single-partition
    * MemoryStream EventStreamSpec replays q87's catalog rows through;
    * not guaranteed for a multi-partition source). Under disorder the
    * kept row is simply the first arrival.
    *
    * State: one entry per ACTIVE (user, type, bucket) — buckets older
    * than the watermark evict, so memory tracks delay × event rate,
    * never stream history. The bucket arithmetic (floored epoch / 600)
    * is byte-identical to the batch query's, so batch backfill and the
    * live stream agree on bucket edges.
    */
  def throttle(events: DataFrame, bucketSeconds: Int = 600,
               watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withColumn("__b", floor(unix_timestamp(col("ts")) / bucketSeconds))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "__b")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("__b").cast("long").as("bucket"))

  /** STREAM-STREAM interval join — funnel attribution, the join class
    * `enrich`'s stream-static shape cannot express: every `effectType`
    * event joins the same user's `causeType` events that happened at
    * most `withinMinutes` before it (click → purchase, impression →
    * click). Both sides are live streams; Spark buffers each side's
    * rows in watermark-bounded state and emits a match as soon as both
    * rows have arrived.
    *
    * Scale/state: the time-range predicate plus both watermarks lets
    * the engine evict buffered rows once they can no longer match
    * (cause rows older than watermark + interval are gone), so state
    * tracks the join WINDOW, not stream history; the join shuffles
    * both streams once on the user key. Batch semantics are identical
    * (watermarks are no-ops): EventStreamSpec pins stream ≡ batch on
    * the same data.
    */
  def attribute(events: DataFrame, causeType: String, effectType: String,
                withinMinutes: Int,
                watermarkDelay: String = "1 hour"): DataFrame = {
    val cause = events.filter(col("event_type") === causeType)
      .select(col("event_id").as("cause_id"), col("user_id"),
        col("ts").as("cause_ts"))
      .withWatermark("cause_ts", watermarkDelay)
      .alias("cause")
    val effect = events.filter(col("event_type") === effectType)
      .select(col("event_id").as("effect_id"), col("user_id"),
        col("ts").as("effect_ts"))
      .withWatermark("effect_ts", watermarkDelay)
      .alias("effect")
    cause.join(effect,
        expr(s"""cause.user_id = effect.user_id AND
                 effect_ts >= cause_ts AND
                 effect_ts <= cause_ts + INTERVAL $withinMinutes MINUTES"""))
      .select(col("cause.user_id").as("user_id"),
        col("cause_id"), col("effect_id"),
        col("cause_ts"), col("effect_ts"),
        (unix_timestamp(col("effect_ts")) -
          unix_timestamp(col("cause_ts"))).as("lag_seconds"))
  }

  /** Per-window trending top-k event types — streaming RANKING, which
    * append-mode window functions cannot express: counts accumulate in
    * per-window state (`flatMapGroupsWithState` keyed by window start)
    * and the window's top `k` is emitted EXACTLY ONCE, when the
    * watermark passes its end — the leaderboard pattern.
    *
    * Scale: state is (window × distinct event types) counters —
    * independent of event volume; the shuffle is keyed by window
    * start, and ties rank deterministically by (count desc, type).
    */
  def trendingTopK(events: Dataset[Event], k: Int, windowMinutes: Int): Dataset[Trending] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winMs = windowMinutes * 60000L
    events
      .withWatermark("ts", s"$windowMinutes minutes")
      // floorDiv, not truncating /: a pre-1970 ts (negative getTime)
      // must land in its own window, not collapse into epoch 0 — the
      // same rule retention/funnel/driftTimeline already use
      .groupByKey(e => Math.floorDiv(e.ts.getTime, winMs) * winMs)
      .flatMapGroupsWithState[TrendState, Trending](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (winStart: Long, rows: Iterator[Event], state: GroupState[TrendState]) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
              .zipWithIndex.iterator.map { case ((t, n), i) =>
                Trending(new Timestamp(winStart), t, n, i + 1)
              }
          } else {
            val cur = state.getOption.map(_.counts).getOrElse(Map.empty)
            val upd = rows.foldLeft(cur) { (m, e) =>
              m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
            }
            state.update(TrendState(upd))
            // close once the watermark passes the window end
            state.setTimeoutTimestamp(winStart + winMs)
            Iterator.empty
          }
      }
  }

  /** One row per (user, active day) first occurrence, with the user's
    * cohort (first-seen) day attached — the streaming PRODUCER of the
    * q81 retention input, in the `userSketches` deployment shape: the
    * stream is scanned once ever, the emitted activity table is tiny
    * (≤ one row per user-day), and any retention matrix is a batch
    * `groupBy(cohort_day, day_offset).count()` over it — count(*) IS
    * the distinct-user count because emission is deduped per
    * (user, day) in state (EventStreamSpec pins stream ≡ q81 on real
    * corpus rows).
    *
    * State per user: first-seen epoch day + the distinct active-day
    * set — calendar-bounded (a decade-long daily user is ~4k ints),
    * same bound the batch q81 collect_set carries; no timeout, because
    * evicting a user would reset their cohort on return. Late
    * PRE-cohort activity (an earlier day arriving after the cohort was
    * emitted) is dropped: append mode cannot retract the already-
    * emitted offsets a re-based cohort would invalidate — the
    * documented first-touch-attribution trade, negligible under any
    * sane watermark.
    */
  def retention(events: Dataset[Event]): Dataset[Activity] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserDays, Activity](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserDays]) =>
          val out = Seq.newBuilder[Activity]
          var cur = state.getOption.getOrElse(UserDays(Int.MaxValue, Seq.empty))
          rows.toArray.map(e => Math.floorDiv(e.ts.getTime, 86400000L).toInt)
            .sorted.foreach { d =>
              if (cur.first == Int.MaxValue) {
                cur = UserDays(d, Seq(d))
                out += Activity(userId, new Timestamp(d * 86400000L), 0L)
              } else if (d >= cur.first && !cur.seen.contains(d)) {
                cur = UserDays(cur.first, cur.seen :+ d)
                out += Activity(userId, new Timestamp(cur.first * 86400000L),
                  (d - cur.first).toLong)
              } // d < first: late pre-cohort activity, dropped (see doc)
            }
          state.update(cur)
          out.result().iterator
      }
  }

  final case class Activity(user_id: Long, cohort_day: Timestamp,
                            day_offset: Long)
  // per-user retention state: first-seen epoch day + distinct active days
  final case class UserDays(first: Int, seen: Seq[Int])

  /** Stream–static enrichment join: each event picks up its user's
    * dimension attributes. The static side is re-planned per
    * micro-batch (so a dimension refresh is picked up without restart)
    * and broadcast when it is small — the standard streaming-ETL
    * enrichment shape; no streaming state at all, so it scales with
    * the micro-batch, not the stream's history.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String = "user_id",
             broadcastDim: Boolean = true): DataFrame =
    events.join(if (broadcastDim) broadcast(dim) else dim, Seq(key), "left")

  /** Declarative sessionization twin — Spark's built-in
    * `session_window` (merging windows keyed by (user, session)):
    * the same inactivity-gap rule as `sessionize` below, expressed as
    * a windowed aggregate instead of custom state. Boundary semantics
    * MATCH: session_window merges sessions whose extents touch, so an
    * event exactly `gap` after its predecessor stays in the same
    * session — identical to `sessionize`'s split-on-`> gap` rule
    * (EventStreamSpec pins the equality, boundary included — measured,
    * not assumed: the half-open-window reading would predict a split
    * there, and is wrong). Prefer this form when the
    * per-session output is aggregates (state is managed by the
    * engine, plans stay declarative); drop to `sessionize`'s
    * flatMapGroupsWithState only for custom per-session logic.
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int,
                     watermarkDelay: String = "1 hour"): DataFrame = {
    val D = DecimalType(18, 4)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("__w"))
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value").cast(D)).cast("double").as("total_value"))
      .select(col("user_id"), col("start"), col("end"),
        col("n_events"), col("total_value"))
  }

  /** Incremental Markov-transition PAIR feed — the q115 family's
    * streaming twin in the drift-cell pattern (the q101 incremental
    * producer): the stream emits one (user, from, to) row per
    * consecutive event pair as it arrives, and the Markov TABLE
    * (counts + row-normalized p) is a batch re-agg of the stored
    * pairs ([[markovTable]]) — exact integer cells merge, so any
    * ingest range's transition matrix is recomputable without
    * re-scanning events. State per user is ONE last-event record
    * (`flatMapGroupsWithState`, no timeout — user-count bounded,
    * tiny; event text/value never enters state). Within a micro-batch
    * events sort by (ts, event_id) — q115's exact order — and across
    * batches the state bridges the boundary pair. Stream ≡ batch is
    * exact for per-user in-order feeds (the replay/ingest contract;
    * EventStreamSpec pins stream-pairs-then-agg ≡ the batch window
    * plan on corpus rows split across several batches).
    */
  def transitions(events: Dataset[Event]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[LastEvent]) =>
          val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Transition]
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach(l =>
              out += Transition(userId, l.event_type, e.event_type, e.ts))
            last = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  final case class FunnelUpdate(user_id: Long, t_signup: Long,
                                t_click: Option[Long], t_purchase: Option[Long],
                                stage: Int)
  // -1 = stage not reached (encoder-friendly sentinel; never emitted)
  final case class FunnelState(s: Long, c: Long, p: Long)

  /** ORDERED-FUNNEL streaming twin (q129): per user, the earliest
    * signup, the earliest click strictly AFTER it, the earliest
    * purchase strictly AFTER that — as a per-user stage state machine
    * (the [[transitions]] pattern: state is three epoch-second longs
    * per user, event payloads never enter state). A row is emitted
    * whenever a user's funnel ADVANCES, so the stream's latest row
    * per user equals the batch q129 row at every point in time.
    *
    * Stage comparisons run in epoch SECONDS (the batch plan's
    * unix_timestamp grain); within a micro-batch events sort by
    * (ts, event_id), and the per-user in-order feed contract (same as
    * [[transitions]]) bridges batches. Stream ≡ batch is pinned in
    * EventStreamSpec on corpus rows split across batches.
    */
  def funnel(events: Dataset[Event], signup: String = "signup",
             click: String = "click", purchase: String = "purchase"): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
          val before = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          var st = before
          sorted.foreach { e =>
            val sec = Math.floorDiv(e.ts.getTime, 1000L)
            if (e.event_type == signup && st.s < 0)
              st = st.copy(s = sec)
            else if (e.event_type == click && st.s >= 0 && st.c < 0 && sec > st.s)
              st = st.copy(c = sec)
            else if (e.event_type == purchase && st.c >= 0 && st.p < 0 && sec > st.c)
              st = st.copy(p = sec)
          }
          if (st == before) Iterator.empty
          else {
            state.update(st)
            Iterator.single(FunnelUpdate(userId, st.s,
              if (st.c >= 0) Some(st.c) else None,
              if (st.p >= 0) Some(st.p) else None,
              1 + (if (st.c >= 0) 1 else 0) + (if (st.p >= 0) 1 else 0)))
          }
      }
  }

  final case class RollingUpdate(event_id: Long, event_type: String,
                                 epoch: Long, n_1h: Long, mean_1h: Double)
  final case class RollEntry(epoch: Long, eventId: Long, value: Double)
  // ascending (epoch, eventId); pruned to the trailing window each batch
  // sumScaled = running exact window sum in 10^-6 units (the
  // DECIMAL(18,6) device) — maintained add-on-insert/subtract-on-evict
  // so each epoch pays O(new + evicted), not an O(window) refold of
  // the whole buffer (round-18 review)
  final case class RollState(entries: List[RollEntry], sumScaled: Long)

  /** ROLLING TRAILING-WINDOW streaming twin (q131): per event type,
    * the trailing `windowSecs` event count and exact-decimal mean at
    * every event. State per type is ONLY the window's own contents
    * (epoch, id, value — pruned as the frame slides), i.e. the same
    * bound as one chunk partition of the batch operator
    * (DistributedRank.rollingRange).
    *
    * RANGE-frame tie semantics: all events sharing (type, epoch) are
    * mutual frame peers, so rows of an epoch are emitted only after
    * the whole epoch is inserted — the replay contract is therefore
    * EPOCH-GRANULAR ingestion (rows sharing (type, epoch) arrive in
    * one micro-batch, in per-type order), one notch stronger than
    * [[transitions]]' per-user ordering. Arithmetic mirrors the batch
    * plan digit-for-digit: per-value DECIMAL(18,6) half-up cast,
    * exact decimal sum (order-free), one double division, round-9.
    */
  def rollingFeatures(events: Dataset[Event], windowSecs: Long = 3600L): Dataset[RollingUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[RollState, RollingUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[Event], state: GroupState[RollState]) =>
          val sorted = rows.toArray
            .map(e => RollEntry(Math.floorDiv(e.ts.getTime, 1000L), e.event_id, e.value))
            .sortBy(e => (e.epoch, e.eventId))
          val out = Seq.newBuilder[RollingUpdate]
          // exact 10^-6 units of one value — the per-value
          // DECIMAL(18,6) HALF_UP cast of the batch plan
          def scaled6(v: Double): Long =
            java.math.BigDecimal.valueOf(v)
              .setScale(6, java.math.RoundingMode.HALF_UP)
              .unscaledValue().longValueExact()
          var buf = state.getOption.map(_.entries.toVector).getOrElse(Vector.empty)
          // running exact sum: add on insert, subtract on evict —
          // identical to refolding the window (long units are the
          // decimal's unscaled value; addition is order-free) at
          // O(new + evicted) per epoch instead of O(window)
          var sumScaled = state.getOption.map(_.sumScaled).getOrElse(0L)
          var i = 0
          while (i < sorted.length) {
            val epoch = sorted(i).epoch
            var j = i
            while (j < sorted.length && sorted(j).epoch == epoch) j += 1
            val incoming = sorted.slice(i, j)
            incoming.foreach(e => sumScaled += scaled6(e.value))
            val merged = buf ++ incoming
            val (evicted, kept) = merged.span(_.epoch <= epoch - windowSecs)
            evicted.foreach(e => sumScaled -= scaled6(e.value))
            buf = kept
            val n = buf.size.toLong
            val sumDouble = java.math.BigDecimal.valueOf(sumScaled, 6).doubleValue()
            val mean = graft.util.Round9.r9(sumDouble / n)
            while (i < j) {
              out += RollingUpdate(sorted(i).eventId, typ, epoch, n, mean)
              i += 1
            }
          }
          if (buf.nonEmpty) state.update(RollState(buf.toList, sumScaled))
          out.result().iterator
      }
  }

  final case class DriftPoint(event_type: String, day: Long,
      n_prev: Long, n_cur: Long, tvd: Double)
  final case class DriftState(curDay: Long, cur: Map[Long, Long],
      prevDay: Long, prev: Map[Long, Long])

  /** Streaming twin of q153 (FeatureDrift.tvdTimeline): day-over-day
    * TVD of the value distribution per event type, emitted as a live
    * monitoring series. State per type = the OPEN day's bin histogram
    * plus the last CLOSED day's — histograms only (bins × 2 entries),
    * never events. A day's drift point emits when its successor opens
    * (the first strictly-later-day row arrives), exactly when its
    * histogram is complete under the replay contract; the final,
    * still-open day has no point yet — so the stream equals the batch
    * series restricted to closed days (EventStreamSpec pins it).
    * Replay contract: per type, rows arrive day-monotonically across
    * micro-batches (same epoch-granular contract as
    * [[rollingFeatures]], coarsened to days). Arithmetic mirrors the
    * batch plan: exact long bin counts, exact integer cross products,
    * one double division, round-9.
    */
  def driftTimeline(events: Dataset[Event], binWidth: Double = 50.0): Dataset[DriftPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    def tvdOf(prev: Map[Long, Long], cur: Map[Long, Long]): (Long, Long, Double) = {
      val m = prev.values.sum; val n = cur.values.sum
      // numerator in BigInt, mirroring the batch twin's DECIMAL(30,0)
      // sum: Σ|cur_b·M − prev_b·N| is bounded by 2·N·M, which clears
      // Long past ~2^31 events per (type, day) (round-15 advice fix)
      val num = (prev.keySet ++ cur.keySet).toSeq.map { b =>
        (BigInt(cur.getOrElse(b, 0L)) * m - BigInt(prev.getOrElse(b, 0L)) * n).abs
      }.sum
      (m, n, graft.util.Round9.r9(
        num.toDouble / (m.toDouble * n.toDouble * 2.0)))
    }
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftState, DriftPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[Event], state: GroupState[DriftState]) =>
          val out = Seq.newBuilder[DriftPoint]
          var st = state.getOption.getOrElse(
            DriftState(Long.MinValue, Map.empty, Long.MinValue, Map.empty))
          rows.toArray.map(e => (Math.floorDiv(Math.floorDiv(e.ts.getTime, 1000L), 86400L),
              math.floor(e.value / binWidth).toLong))
            .sortBy(_._1)
            .foreach { case (day, bin) =>
              if (st.curDay == Long.MinValue) st = st.copy(curDay = day)
              else if (day > st.curDay) {
                // the open day closes: emit its point if its predecessor closed
                if (st.prevDay == st.curDay - 1 && st.prev.nonEmpty) {
                  val (m, n, tvd) = tvdOf(st.prev, st.cur)
                  out += DriftPoint(typ, st.curDay, m, n, tvd)
                }
                st = DriftState(day, Map.empty, st.curDay, st.cur)
              }
              st = st.copy(cur = st.cur.updated(bin, st.cur.getOrElse(bin, 0L) + 1L))
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** The batch consumer of [[transitions]]' stored pair rows: exact
    * (from, to) counts and the row-normalized transition probability —
    * q115's output shape over the incremental cells.
    */
  def markovTable(pairs: DataFrame): DataFrame = {
    val c2 = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val c1 = c2.groupBy(col("from_type")).agg(sum(col("c")).as("__c1"))
    c2.join(c1, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("c"),
        round(col("c").cast("double") / col("__c1"), 9).as("p"))
  }

  /** Per-user sessionization with an inactivity gap — custom streaming
    * state via `flatMapGroupsWithState` (event-time timeout): a session
    * closes, and is emitted exactly once, when the watermark passes
    * `last event + gap`. The built-in `session_window` (above) covers
    * the aggregate-output case; this custom-state form exists for
    * per-session logic a windowed aggregate cannot express.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    // value -> exact 10^-4 units, HALF_UP — byte-identical to the
    // DECIMAL(18,4) cast the built-in sessionWindows sums, so the two
    // forms agree on total_value for ANY event order and any decimal
    // tail (round-18 review: the raw running double diverged on
    // >4-decimal values and was order-dependent on ts ties)
    def scaled(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(4, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    def emit(userId: Long, s: SessionState): Session =
      Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n,
        java.math.BigDecimal.valueOf(s.totalScaled, 4).doubleValue())
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s))
          } else {
            // fold the micro-batch's events into (possibly several)
            // sessions; emit every closed one, keep the open one in
            // state. Sort by the repo's (ts, event_id) total order —
            // ts alone left the fold order run-dependent on ties.
            val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t < s.start - gapMs =>
                  // out-of-order ISLAND strictly more than a gap before
                  // the open session: session_window keeps it a separate
                  // (already-closed) session — it must not merge through
                  // the open one's start. DEFENSIVE under current Spark:
                  // the stateful operator filters rows below the
                  // watermark, and watermark = maxSeen − gap ≥ s.start −
                  // gap, so such rows never arrive today — but the
                  // branch keeps the semantics right if fMGWS late-row
                  // filtering ever loosens (it is version-dependent).
                  closed += emit(userId, SessionState(t, t, 1,
                    scaled(e.value)))
                case Some(s) if t - s.last <= gapMs =>
                  // math.min on start: a watermark-allowed OUT-OF-ORDER
                  // event within a gap of the open extent can EXTEND it
                  // backwards — session_window lowers the start the
                  // same way (round-18 review: max-only start froze at
                  // the first-seen event)
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t),
                    s.n + 1, s.totalScaled + scaled(e.value)))
                case Some(s) =>
                  closed += emit(userId, s)
                  cur = Some(SessionState(t, t, 1, scaled(e.value)))
                case None =>
                  cur = Some(SessionState(t, t, 1, scaled(e.value)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
