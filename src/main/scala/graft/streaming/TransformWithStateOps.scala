package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/**
 * Arbitrary streaming state on Spark's `transformWithState` API — the
 * operator large deployments are migrating custom state to (typed named
 * state + first-class timers on the RocksDB state store, with state
 * evolution and independent per-state TTL that `mapGroupsWithState`'s
 * single-blob state cannot express).
 *
 * The reference library has no streaming code (SURVEY.md §2.4); this file
 * exists so the engine's custom-state semantics are proven on BOTH
 * arbitrary-state APIs: [[StreamingOps.sessionSummaries]] carries the
 * `mapGroupsWithState` path, and [[TransformWithStateOps.sessionSummariesTws]]
 * carries the same per-user session-summary semantics through
 * `transformWithState`, value-for-value against the same DuckDB oracle
 * (q135 vs q94). The API must be invisible in the results.
 *
 * Scale contract: state per user is ONE SessionSummary row plus at most
 * ONE registered timer (stale timers are deleted on every update), and
 * eviction is event-time driven — watermark passes `last_ts + idle` →
 * the timer fires, the final summary is emitted, and the state row is
 * cleared. State size is |active users within the idle horizon|, not
 * lifetime-distinct users, and an idle stream schedules no busy-spin
 * batches (event-time timers only fire on watermark advance).
 */
object TransformWithStateOps {

  /** One typed event on the stream (input of [[distinctTypesTws]]). */
  case class TypedEvent(user_id: Long, event_type: String)

  /** Running per-user distinct-type accounting (output of
   * [[distinctTypesTws]]). */
  case class TypeCount(user_id: Long, n_types: Long, n_events: Long)

  /** Per-user running session summary via `transformWithState`: ValueState
   * holds the summary, an event-time timer retires it `idleMs` past the
   * user's latest event. Emission contract matches
   * [[StreamingOps.sessionSummaries]]: every touched user re-emits its
   * updated summary per micro-batch (update mode), and retirement emits
   * the final summary once more — so the argmax-by-n_events per user is
   * batching-independent and equals the batch aggregation.
   */
  class SessionTwsProcessor(idleMs: Long)
      extends StatefulProcessor[Long, UserEvent, SessionSummary] {

    @transient private var session: ValueState[SessionSummary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionSummary](
        "session", Encoders.product[SessionSummary], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      var summary = Option(session.get()).getOrElse(
        SessionSummary(userId, null, null, 0L))
      rows.foreach { e =>
        val first =
          if (summary.first_ts == null || e.ts.before(summary.first_ts)) e.ts
          else summary.first_ts
        val last =
          if (summary.last_ts == null || e.ts.after(summary.last_ts)) e.ts
          else summary.last_ts
        summary = SessionSummary(userId, first, last, summary.n_events + 1)
      }
      session.update(summary)
      // One live timer per key: drop whatever was scheduled before, then
      // register retirement at last_ts + idle — clamped just above the
      // current watermark, since the watermark may already be past the
      // target for a late-arriving group (it then fires on the next
      // watermark advance, same clamp rule as sessionSummaries).
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      val target = summary.last_ts.getTime + idleMs
      getHandle.registerTimer(math.max(target, timerValues.getCurrentWatermarkInMs + 1L))
      Iterator.single(summary)
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val last = session.get()
      if (last == null) Iterator.empty
      else if (timerValues.getCurrentWatermarkInMs >= last.last_ts.getTime + idleMs) {
        // Genuinely idle past the horizon: final emission, state retired.
        session.clear()
        Iterator.single(last)
      } else {
        // A clamped early timer from a late-arriving group: the session is
        // still live — reschedule at its true horizon, emit nothing.
        getHandle.registerTimer(math.max(last.last_ts.getTime + idleMs,
          timerValues.getCurrentWatermarkInMs + 1L))
        Iterator.empty
      }
    }
  }

  /** [[StreamingOps.sessionSummaries]] re-expressed on `transformWithState`
   * (event-time mode, update output). Requires the RocksDB state store
   * provider — the only backend `transformWithState` runs on — which the
   * caller sets around `.start()` (see q135). */
  def sessionSummariesTws(spark: SparkSession, events: Dataset[UserEvent],
      idleTimeout: String = "30 minutes", watermark: String = "2 hours"): Dataset[SessionSummary] = {
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(idleTimeout))
    val idleMs =
      iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTwsProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Per-user exact distinct-type accounting on `transformWithState`'s
   * MapState — the composite-state primitive `mapGroupsWithState` can only
   * fake by round-tripping a whole serialized collection per key per
   * batch. MapState reads/writes individual entries against the store, so
   * a batch touching one type of a 10,000-type user does O(1) state I/O,
   * not O(types). State per user = one map entry per DISTINCT type seen
   * (the minimal bound for exact per-type accounting) plus one value row
   * for the event total.
   *
   * Emission contract (update mode): every touched user re-emits
   * `(user_id, n_types, n_events)` per micro-batch; both counters grow
   * monotonically, so the per-user argmax over emissions is
   * batching-independent and equals the batch GROUP BY — the q141 oracle.
   */
  class DistinctTypesTwsProcessor
      extends StatefulProcessor[Long, TypedEvent, TypeCount] {

    @transient private var perType: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      perType = getHandle.getMapState[String, Long](
        "perType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long](
        "total", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[TypeCount] = {
      var n = Option(total.get()).getOrElse(0L)
      rows.foreach { e =>
        n += 1
        val seen = if (perType.containsKey(e.event_type))
          perType.getValue(e.event_type) else 0L
        perType.updateValue(e.event_type, seen + 1L)
      }
      total.update(n)
      var types = 0L
      perType.keys().foreach(_ => types += 1)
      Iterator.single(TypeCount(userId, types, n))
    }
  }

  /** Exact per-user distinct event types + event totals, continuously
   * maintained (MapState). See [[DistinctTypesTwsProcessor]]. */
  def distinctTypesTws(spark: SparkSession,
      events: Dataset[TypedEvent]): Dataset[TypeCount] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new DistinctTypesTwsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** One event for recent-history tracking (input of [[recentKTws]]). */
  case class RecentEvent(user_id: Long, ts_us: Long, event_id: Long)

  /** A user's bounded recent history: the `k` latest events by
   * (ts_us, event_id), newest first, plus the lifetime arrival count. */
  case class RecentK(user_id: Long, n_seen: Long, recent: Seq[RecentEvent])

  /** Bounded recent-history view on `transformWithState`'s ListState — the
   * "last k interactions per user" feature store every personalization /
   * session-context pipeline maintains. State per user is AT MOST k list
   * entries (the store sees k-element rewrites, never the event firehose)
   * plus one ValueState counter; unlike a window over the raw stream,
   * nothing downstream ever holds a user's full history.
   *
   * Emission (update mode): every touched user re-emits its current top-k
   * and lifetime count; `n_seen` grows monotonically, so the per-user
   * argmax is batching-independent — and because the top-k by
   * (ts_us, event_id) is ORDER-INSENSITIVE over the union of arrivals,
   * the final list equals the batch window ranking (the q144 oracle).
   */
  class RecentKTwsProcessor(k: Int)
      extends StatefulProcessor[Long, RecentEvent, RecentK] {

    @transient private var recent: ListState[RecentEvent] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[RecentEvent](
        "recent", Encoders.product[RecentEvent], TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, rows: Iterator[RecentEvent],
        timerValues: TimerValues): Iterator[RecentK] = {
      val arrivals = rows.toArray
      val merged = (recent.get().toArray ++ arrivals)
        .sortBy(e => (-e.ts_us, -e.event_id))
        .take(k)
      recent.put(merged)
      val n = Option(seen.get()).getOrElse(0L) + arrivals.length
      seen.update(n)
      Iterator.single(RecentK(userId, n, merged.toSeq))
    }
  }

  /** Last-`k`-events-per-user view, continuously maintained (ListState).
   * See [[RecentKTwsProcessor]]. */
  def recentKTws(spark: SparkSession, events: Dataset[RecentEvent],
      k: Int): Dataset[RecentK] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RecentKTwsProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** One sampling-candidate row on the stream (input of
   * [[reservoirSampleTws]]): `ticket` is the deterministic md5-64 draw
   * (computed in the stream projection, so the state store never sees
   * text — the reservoir shuffles 24-byte coordinates). */
  case class RsvDoc(source: String, doc_id: Long, ticket: Long)

  /** A key's current reservoir: the `k` members with the SMALLEST
   * (ticket, doc_id), ascending, plus the lifetime arrival count. */
  case class Reservoir(source: String, n_seen: Long, sample: Seq[RsvDoc])

  /** Streaming DETERMINISTIC reservoir sample — a uniform-without-
   * replacement k-sample per key over an unbounded stream, continuously
   * maintained with O(k) state. The QA-sample stage of a production
   * ingest: "keep ~k inspectable documents per source from the firehose"
   * without ever storing the firehose.
   *
   * Classic reservoir sampling (Vitter's Algorithm R) is arrival-order-
   * dependent — replaying the stream in a different batching draws a
   * DIFFERENT sample, which makes the stage untestable and the sample
   * unauditable. This is the min-ticket formulation instead (the same
   * hash-order trick as [[graft.operators.Sampling.weightedSample]], unit
   * weights): every row draws the deterministic ticket md5-64("rsv:"+id),
   * and the reservoir keeps the k smallest (ticket, id). Min-k of a union
   * is the min-k of min-ks, so the result is BATCHING-INDEPENDENT — any
   * replay, any micro-batch boundaries, same sample — and equals the
   * batch ranking `row_number() OVER (ORDER BY ticket, id) <= k` per key,
   * which is the q190 oracle. Uniformity is the hash's: every subset of
   * size k is equally likely under the md5 order of fresh ids.
   *
   * State per key: ONE ListState rewrite of ≤ k coordinate entries per
   * touched batch plus a ValueState counter — the store never sees the
   * event volume. Emission (update mode): every touched key re-emits its
   * current reservoir; `n_seen` grows monotonically, so max-by-n_seen per
   * key is the final view under any batching.
   */
  class ReservoirTwsProcessor(k: Int)
      extends StatefulProcessor[String, RsvDoc, Reservoir] {

    @transient private var sample: ListState[RsvDoc] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sample = getHandle.getListState[RsvDoc](
        "sample", Encoders.product[RsvDoc], TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(source: String, rows: Iterator[RsvDoc],
        timerValues: TimerValues): Iterator[Reservoir] = {
      val arrivals = rows.toArray
      val merged = (sample.get().toArray ++ arrivals)
        .sortBy(d => (d.ticket, d.doc_id))
        .take(k)
      sample.put(merged)
      val n = Option(seen.get()).getOrElse(0L) + arrivals.length
      seen.update(n)
      Iterator.single(Reservoir(source, n, merged.toSeq))
    }
  }

  /** Deterministic k-per-key reservoir over a stream of ticketed rows.
   * See [[ReservoirTwsProcessor]]; tickets come from the caller's
   * projection (md5-64 of the row id — auditable off-engine). */
  def reservoirSampleTws(spark: SparkSession, docs: Dataset[RsvDoc],
      k: Int): Dataset[Reservoir] = {
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(new ReservoirTwsProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** One gated row: quasi-identifier fields + the row id
   * (input/output of [[kAnonymityGateTws]]). */
  case class KaRow(event_type: String, vb: Int, event_id: Long)

  /** The quasi-identifier cohort key of [[KaRow]]. */
  case class KaKey(event_type: String, vb: Int)

  /**
   * Streaming k-anonymity gate — delayed-release suppression, the
   * streaming face of [[graft.operators.Privacy.kAnonymityAudit]]: no
   * row becomes visible until its quasi-identifier cohort holds at
   * least k rows (a row released earlier would be re-identifiable by
   * exactly the linkage the batch audit counts). Rows of a still-small
   * cohort BUFFER in state; the arrival that takes the cohort to k
   * releases the whole buffer, and every later row passes straight
   * through.
   *
   * Batching-independent by construction: release is MONOTONE (a cohort
   * never un-reaches k) and each row emits exactly once — any batch
   * slicing yields the same released set, which is what makes the batch
   * oracle exact under a single-file drain (rows whose cohort total
   * ≥ k). State per key: one counter + a buffer of AT MOST k−1 rows
   * (cleared forever at release) — the suppressed tail is the only
   * state that persists, and its size is the privacy parameter, not the
   * stream length.
   */
  class KAnonGateProcessor(k: Int)
      extends StatefulProcessor[KaKey, KaRow, KaRow] {

    @transient private var nSeen: ValueState[Long] = _
    @transient private var buffer: ListState[KaRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nSeen = getHandle.getValueState[Long](
        "n", Encoders.scalaLong, TTLConfig.NONE)
      buffer = getHandle.getListState[KaRow](
        "buf", Encoders.product[KaRow], TTLConfig.NONE)
    }

    override def handleInputRows(key: KaKey, rows: Iterator[KaRow],
        timerValues: TimerValues): Iterator[KaRow] = {
      val arrivals = rows.toArray
      val before = Option(nSeen.get()).getOrElse(0L)
      val total = before + arrivals.length
      nSeen.update(total)
      if (before >= k) {
        arrivals.iterator // cohort already public: pass through
      } else if (total >= k) {
        // This batch crosses the threshold: release the held tail + the
        // arrivals, retire the buffer for good.
        val held = buffer.get().toArray
        buffer.clear()
        (held ++ arrivals).iterator
      } else {
        buffer.put(buffer.get().toArray ++ arrivals) // ≤ k-1 entries
        Iterator.empty
      }
    }
  }

  /** k-anonymity delayed-release gate over a stream of QI-keyed rows.
   * See [[KAnonGateProcessor]]. */
  def kAnonymityGateTws(spark: SparkSession, rows: Dataset[KaRow],
      k: Int): Dataset[KaRow] = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    rows
      .groupByKey(r => KaKey(r.event_type, r.vb))
      .transformWithState(new KAnonGateProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** CDC latest-wins state on `transformWithState`, WARM-STARTED from a
   * batch snapshot — the state-migration path a deployment takes when
   * moving an existing continuously-maintained view onto this API: the
   * accumulated state loads through `handleInitialState` (once per key,
   * before any stream data), and the stream then applies the same
   * strictly-newer `(seq_us, seq_id)` replacement rule as
   * [[StreamingOps.cdcCurrentState]] — so a late stream change older than
   * the snapshot can never regress the view, and the warm-started query
   * is indistinguishable from one that had processed the history itself
   * (q147's oracle: the batch latest-wins over the FULL changeset).
   *
   * Emission: update-mode snapshots for stream-touched keys only —
   * initial-state loading emits nothing (the snapshot is already
   * materialized wherever it came from); the continuous view is
   * emissions ∪ untouched snapshot rows.
   */
  class CdcTwsProcessor
      extends StatefulProcessorWithInitialState[Long, CdcChange, CdcState, CdcState] {

    @transient private var current: ValueState[CdcState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      current = getHandle.getValueState[CdcState](
        "current", Encoders.product[CdcState], TTLConfig.NONE)

    override def handleInitialState(key: Long, initial: CdcState,
        timerValues: TimerValues): Unit =
      current.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[CdcChange],
        timerValues: TimerValues): Iterator[CdcState] = {
      var st = current.get() // null when the key is new to snapshot+stream
      rows.foreach { c =>
        val newer = st == null || c.seq_us > st.seq_us ||
          (c.seq_us == st.seq_us && c.seq_id > st.seq_id)
        if (newer)
          st = CdcState(key, c.seq_us, c.seq_id, c.op == "D",
            c.acct_cents, c.segment)
      }
      current.update(st)
      Iterator.single(st)
    }
  }

  /** [[StreamingOps.cdcCurrentState]] on `transformWithState`, seeded with
   * `snapshot` (one [[CdcState]] row per key) before the first batch. */
  def cdcCurrentStateTws(spark: SparkSession, changes: Dataset[CdcChange],
      snapshot: Dataset[CdcState]): Dataset[CdcState] = {
    import spark.implicits._
    changes
      .groupByKey(_.k)
      .transformWithState(new CdcTwsProcessor,
        TimeMode.None(), OutputMode.Update(),
        snapshot.groupByKey(_.k))
  }

  /** Silence alert: `user_id` has produced nothing for the configured
   * horizon past `last_ts` (emitted by [[silenceAlertsTws]]). */
  case class SilenceAlert(user_id: Long, last_ts: java.sql.Timestamp)

  /** ABSENCE detection — the streaming semantic only event-time timers
   * can express: an alert must fire precisely when NO data arrives, so no
   * input-driven operator (window, join, aggregation) can produce it. Per
   * user: ValueState holds the latest event time, one live timer sits at
   * `last + silence`; when the watermark passes it with no newer event,
   * the alert emits and the state clears (a returning user later starts
   * a fresh cycle — heartbeat/liveness monitoring over millions of keys
   * with one row + one timer each).
   *
   * Mid-stream silences alert too (by design — that is the production
   * point); under a single-batch drain (one file, AvailableNow) only
   * final silences can fire, which is what makes q152's batch oracle
   * exact: users whose last event precedes the final watermark by ≥ the
   * silence horizon.
   */
  class SilenceTwsProcessor(silenceMs: Long)
      extends StatefulProcessor[Long, UserEvent, SilenceAlert] {

    @transient private var last: ValueState[SilenceAlert] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[SilenceAlert](
        "last", Encoders.product[SilenceAlert], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[SilenceAlert] = {
      var latest = Option(last.get()).map(_.last_ts).orNull
      rows.foreach { e =>
        if (latest == null || e.ts.after(latest)) latest = e.ts
      }
      last.update(SilenceAlert(userId, latest))
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(math.max(latest.getTime + silenceMs,
        timerValues.getCurrentWatermarkInMs + 1L))
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SilenceAlert] = {
      val st = last.get()
      if (st == null) Iterator.empty
      else if (timerValues.getCurrentWatermarkInMs >= st.last_ts.getTime + silenceMs) {
        last.clear()
        Iterator.single(st)
      } else {
        getHandle.registerTimer(math.max(st.last_ts.getTime + silenceMs,
          timerValues.getCurrentWatermarkInMs + 1L))
        Iterator.empty
      }
    }
  }

  /** Per-user silence alerts (see [[SilenceTwsProcessor]]). */
  def silenceAlertsTws(spark: SparkSession, events: Dataset[UserEvent],
      silence: String = "6 hours", watermark: String = "2 hours"): Dataset[SilenceAlert] = {
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(silence))
    val silenceMs =
      iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SilenceTwsProcessor(silenceMs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** One micro-batch's operational metrics (see [[progressReport]]). */
  case class BatchProgress(
      batch_id: Long,
      num_input_rows: Long,
      state_rows: Long,
      state_memory_bytes: Long,
      watermark: String)

  /** The per-batch operational metrics of a drained streaming query —
   * the numbers an operator actually watches on a long-running job:
   * input volume, STATE SIZE (rows + bytes; the quantity every scaladoc
   * bound in this package is about), and watermark progress. Pulled from
   * `recentProgress`, so it works on any sink and any state backend.
   * Bounded: one row per retained micro-batch (conf
   * `spark.sql.streaming.numRecentProgressUpdates`, default 100). */
  def progressReport(spark: SparkSession,
      query: org.apache.spark.sql.streaming.StreamingQuery): Dataset[BatchProgress] = {
    import spark.implicits._
    query.recentProgress.toSeq.map { p =>
      val states = Option(p.stateOperators).getOrElse(Array.empty)
      BatchProgress(
        p.batchId,
        p.numInputRows,
        states.map(_.numRowsTotal).sum,
        states.map(_.memoryUsedBytes).sum,
        Option(p.eventTime).flatMap(m => Option(m.get("watermark"))).orNull)
    }.toDS()
  }

  /** Runs `body` with the RocksDB state store provider set (required by
   * `transformWithState`), restoring the previous provider after. */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val clKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val saved = spark.conf.getOption(key)
    val savedCl = spark.conf.getOption(clKey)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Changelog checkpointing: commit uploads the batch's delta instead
      // of a full RocksDB snapshot — the production setting for
      // commit-latency-sensitive stateful streams (snapshots still happen,
      // asynchronously in the maintenance thread). Pure durability-format
      // choice; values are unaffected.
      spark.conf.set(clKey, "true")
      body
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      savedCl match {
        case Some(v) => spark.conf.set(clKey, v)
        case None => spark.conf.unset(clKey)
      }
    }
  }
}
