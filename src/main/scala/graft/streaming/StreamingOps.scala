package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface: the streaming twins of the batch
  * event-time queries in graft.operators.Analytics. The reference is batch
  * only (SURVEY.md §2.4 — its leases are worker liveness, not event time),
  * so this whole module is north-star extension.
  *
  * Designed for incremental state at scale:
  *  - windowed aggregation carries only (window, type) → (count, sum)
  *    state, bounded by the 10-minute watermark;
  *  - sessionization state is one open session per user key, closed and
  *    emitted via event-time timeout — no unbounded buffering.
  * The same code runs over Kafka/files in production; tests drive it with
  * MemoryStream + processAllAvailable for deterministic batches.
  */
object StreamingOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start_us: Long, last_us: Long, n: Long)

  case class SessionOut(user_id: Long, n_events: Long, duration_s: Long)

  /** Tumbling 1-hour windowed counts with a 10-minute watermark (streaming
    * twin of Analytics.eventHourly). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("n"), col("total_value"))

  /** Streaming exact dedup: first event per (user, type) key, state
    * bounded by the watermark — the streaming twin of the exact-dedup
    * batch operator (keeps only the earliest-seen row per key). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")

  /** Stream-stream INNER join with an event-time range: each view pairs
    * with the same user's purchases inside [view_ts, view_ts + 1 h]. Both
    * sides carry watermarks and the join condition bounds event time, so
    * the state store retains each side only until the other side's
    * watermark passes the window — bounded state at any volume, the
    * streaming twin of a batch interval self-join. Inner-join matches
    * emit as soon as both rows have arrived (no flush sentinel needed);
    * `gap_s` is computed in the µs domain to mirror the batch oracle. */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        floor((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) / 1000000L)
          .as("gap_s"))
  }

  /** Stream-static enrichment join: each event picks up its dimension row
    * (nation here; any slowly-changing dim in production) via a STATELESS
    * broadcast hash join — no watermark, no state store, the map-side
    * enrichment shape every ingest pipeline runs before writing bronze →
    * silver tables. The static side is re-resolvable per micro-batch, so
    * a dim refresh is picked up without restarting the query; at any
    * scale the stream side never shuffles for this join. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, dimKey: String): DataFrame =
    events
      .withColumn("dim_key", pmod(col("user_id"), lit(25)))
      .join(broadcast(dim), col("dim_key") === col(dimKey))

  /** Stream-stream LEFT OUTER interval join — the hardest join semantics
    * Structured Streaming has: matched pairs emit as soon as both rows
    * arrive (like the inner join), but an UNMATCHED view can only emit
    * its null row once the watermark proves no purchase can still arrive
    * inside [v_ts, v_ts + 1 h] — correctness depends on the state store
    * holding the view exactly until that proof. Both sides must carry
    * watermarks and the condition must bound event time, or Spark
    * rejects the outer join outright (unbounded state). Inputs here are
    * pre-filtered single-type streams whose watermark was assigned
    * UPSTREAM of the filter, so flush sentinels advance event time even
    * though they match neither side. */
  def viewPurchaseLeftJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        floor((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) / 1000000L)
          .as("gap_s"))
  }

  private val GapUs: Long = 30L * 60 * 1000000

  /** Exact event-time micros. Timestamp.getTime is MILLIS — multiplying it
    * by 1000 silently zeroes the sub-ms digits the parquet µs timestamps
    * carry, which shifts session durations (and, at a boundary, gap
    * decisions) by up to 1 ms vs the batch sessionizer's unix_micros. */
  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  /** Event-time sessionization with a 30-minute inactivity gap via
    * flatMapGroupsWithState (streaming twin of Analytics.sessionize).
    * Emits a session when the gap elapses (event-time timeout) — state per
    * key is O(1). */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var out = List.empty[SessionOut]
      var cur = state.getOption
      if (sorted.isEmpty && state.hasTimedOut) {
        cur.foreach { s =>
          out ::= SessionOut(userId, s.n, (s.last_us - s.start_us) / 1000000)
        }
        state.remove()
        return out.iterator
      }
      sorted.foreach { e =>
        val us = micros(e.ts)
        cur match {
          case Some(s) if us - s.last_us <= GapUs =>
            // max: a late-but-within-watermark event older than the tail
            // joins the session without regressing last_us (which would
            // shrink duration and re-arm an earlier close timer)
            cur = Some(s.copy(last_us = math.max(s.last_us, us), n = s.n + 1))
          case Some(s) =>
            out ::= SessionOut(userId, s.n, (s.last_us - s.start_us) / 1000000)
            cur = Some(SessionState(us, us, 1))
          case None =>
            cur = Some(SessionState(us, us, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last_us / 1000 + GapUs / 1000)
      }
      out.reverse.iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class LatestState(last_us: Long, last_event_id: Long,
      last_type: String, n: Long)

  case class LatestOut(user_id: Long, last_us: Long, last_event_id: Long,
      last_type: String, n_events: Long)

  /** Running latest-event-per-user via mapGroupsWithState — the
    * update-mode stateful API (sessionize covers the append-mode flatMap
    * variant); streaming twin of EventAnalytics.latestByKey. State per
    * key is ONE (ts, id, type, count) tuple, the same "one candidate row
    * per key" shape the batch aggregate keeps per partition — a key with
    * millions of events still carries O(1) state. The (us, event_id)
    * tie-break matches the batch max_by ordering exactly.
    *
    * State-size bound: `NoTimeout` is the SEMANTICS of a latest-per-key
    * materialized view (every key's latest must stay queryable forever),
    * so the state store scales with the DISTINCT-KEY cardinality — O(1)
    * per key, but never expiring. At 100× the key space, either accept
    * the proportional state store or bolt on an event-time timeout to
    * evict keys idle past a retention horizon (changing the view's
    * contract from "all keys ever" to "keys active in the window"). */
  def latestPerUser(events: Dataset[Event]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[LatestState]): LatestOut = {
      var s = state.getOption
        .getOrElse(LatestState(Long.MinValue, Long.MinValue, "", 0L))
      batch.foreach { e =>
        val us = micros(e.ts)
        val newer = us > s.last_us ||
          (us == s.last_us && e.event_id > s.last_event_id)
        s =
          if (newer) LatestState(us, e.event_id, e.event_type, s.n + 1)
          else s.copy(n = s.n + 1)
      }
      state.update(s)
      LatestOut(userId, s.last_us, s.last_event_id, s.last_type, s.n)
    }

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** latest-per-key on the MODERN arbitrary-state API — Spark 4's
    * `transformWithState` StatefulProcessor, the successor to
    * mapGroupsWithState: typed named state slots (ValueState/ListState/
    * MapState) with per-slot TTL, timers decoupled from output mode, and
    * schema-evolvable state — the API new pipelines should target.
    * Same fold, same LatestOut contract as latestPerUser, so the bridge
    * can verify both against ONE oracle. State is a single ValueState
    * per key (O(1)); TTL is NONE to match the batch twin's all-keys
    * semantics (production would set a retention TTL here — one line,
    * not a rewrite, which is the point of the new API). Requires the
    * RocksDB state store provider. */
  class LatestStatefulProcessor extends StatefulProcessor[Long, Event, LatestOut] {
    @transient private var st: ValueState[LatestState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[LatestState]("latest",
        org.apache.spark.sql.Encoders.product[LatestState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[LatestOut] = {
      var s =
        if (st.exists()) st.get()
        else LatestState(Long.MinValue, Long.MinValue, "", 0L)
      rows.foreach { e =>
        val us = micros(e.ts)
        val newer = us > s.last_us ||
          (us == s.last_us && e.event_id > s.last_event_id)
        s =
          if (newer) LatestState(us, e.event_id, e.event_type, s.n + 1)
          else s.copy(n = s.n + 1)
      }
      st.update(s)
      Iterator.single(LatestOut(userId, s.last_us, s.last_event_id, s.last_type, s.n))
    }
  }

  def latestPerUserTws(events: Dataset[Event]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new LatestStatefulProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Sessionization on the modern API with EXPLICIT event-time timers —
    * the piece transformWithState adds over flatMapGroupsWithState's
    * single implicit timeout: timers are first-class (register/delete/
    * list, many per key if needed), so the close-the-session alarm is
    * ordinary code instead of a state-machine side channel. Same fold,
    * gap, and SessionOut contract as `sessionize`; a batch that extends
    * a session deletes the superseded alarm and re-registers at the new
    * tail + gap, and `handleExpiredTimer` defensively ignores any stale
    * alarm that outlived a deletion (expiry < current tail + gap).
    * State per key is one SessionState + one pending timer — O(1). */
  class SessionizeStatefulProcessor extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var st: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    private def expiryMs(s: SessionState): Long = s.last_us / 1000 + GapUs / 1000

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      var out = List.empty[SessionOut]
      var cur: Option[SessionState] = if (st.exists()) Some(st.get()) else None
      cur.foreach(s => getHandle.deleteTimer(expiryMs(s)))
      sorted.foreach { e =>
        val us = micros(e.ts)
        cur match {
          case Some(s) if us - s.last_us <= GapUs =>
            // max: keep the timer at the TRUE session tail even when a
            // late-but-within-watermark event arrives out of order
            cur = Some(s.copy(last_us = math.max(s.last_us, us), n = s.n + 1))
          case Some(s) =>
            out ::= SessionOut(userId, s.n, (s.last_us - s.start_us) / 1000000)
            cur = Some(SessionState(us, us, 1))
          case None =>
            cur = Some(SessionState(us, us, 1))
        }
      }
      cur.foreach { s =>
        st.update(s)
        getHandle.registerTimer(expiryMs(s))
      }
      out.reverse.iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      if (expiredTimerInfo.getExpiryTimeInMs() >= expiryMs(s)) {
        st.clear()
        Iterator.single(SessionOut(userId, s.n, (s.last_us - s.start_us) / 1000000))
      } else Iterator.empty
    }
  }

  def sessionizeTws(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeStatefulProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class AttribState(sess: Long, first_id: Long, first_type: String,
      prev_id: Long, prev_type: String, last_us: Long)
  case class AttribOut(user_id: Long, session_id: Long, purchase_id: Long,
      first_touch_id: Long, first_touch_type: String,
      last_touch_id: Option[Long], last_touch_type: Option[String])

  /** Streaming first/last-touch attribution — the per-EVENT consumer of
    * session state, where sessionizeTws is the per-SESSION one: each
    * purchase is attributed the moment it arrives (first event of its
    * 30-min-gap session + the event immediately before it; None when the
    * purchase opens its session). No timers and no watermark: the
    * decision needs only the running session head and the previous
    * event, so state is one O(1) record per user and every output row is
    * final at emission (Update mode appends it exactly once — purchase
    * ids never repeat). Within-batch rows sort by (ts, event_id); across
    * batches the bridge's chronological staging upholds the same order
    * the batch twin's window assumes. */
  class AttributionStatefulProcessor extends StatefulProcessor[Long, Event, AttribOut] {
    @transient private var st: ValueState[AttribState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AttribState]("attrib",
        org.apache.spark.sql.Encoders.product[AttribState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[AttribOut] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var out = List.empty[AttribOut]
      var cur: Option[AttribState] = if (st.exists()) Some(st.get()) else None
      sorted.foreach { e =>
        val us = micros(e.ts)
        val next = cur match {
          case Some(s) if us - s.last_us <= GapUs =>
            s.copy(prev_id = e.event_id, prev_type = e.event_type,
              last_us = math.max(s.last_us, us))
          case other =>
            AttribState(other.map(_.sess + 1).getOrElse(1L),
              e.event_id, e.event_type, e.event_id, e.event_type, us)
        }
        if (e.event_type == "purchase") {
          val opened = cur.forall(s => us - s.last_us > GapUs)
          val (lt, ltt) =
            if (opened) (None, None)
            else (Some(cur.get.prev_id), Some(cur.get.prev_type))
          out ::= AttribOut(userId, next.sess, e.event_id,
            next.first_id, next.first_type, lt, ltt)
        }
        cur = Some(next)
      }
      cur.foreach(st.update)
      out.reverse.iterator
    }
  }

  def attributionTws(events: Dataset[Event]): Dataset[AttribOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new AttributionStatefulProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class LatestInit(user_id: Long, last_us: Long, last_event_id: Long,
      last_type: String, n: Long)

  /** latest-per-key with WARM-STARTED state — the backfill→streaming
    * handoff every production migration needs: a batch job computes the
    * historical per-key state once, the streaming query starts FROM that
    * state (`StatefulProcessorWithInitialState.handleInitialState` seeds
    * each key before its first input row), and live increments continue
    * the fold — no replaying months of history through the stream, no
    * cold-start window where served state is wrong. Keys with no live
    * traffic never enter handleInputRows, so the serving layer reads
    * sink ∪ backfill (the bridge's final max_by does exactly that).
    * Same fold and LatestOut contract as the other two implementations;
    * the equivalence gate is that backfill(first half) + stream(second
    * half) must equal batch over EVERYTHING. */
  class LatestInitStatefulProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, Event, LatestOut, LatestInit] {
    @transient private var st: ValueState[LatestState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[LatestState]("latest",
        org.apache.spark.sql.Encoders.product[LatestState], TTLConfig.NONE)

    override def handleInitialState(userId: Long, initial: LatestInit,
        timerValues: TimerValues): Unit =
      st.update(LatestState(initial.last_us, initial.last_event_id,
        initial.last_type, initial.n))

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[LatestOut] = {
      var s =
        if (st.exists()) st.get()
        else LatestState(Long.MinValue, Long.MinValue, "", 0L)
      rows.foreach { e =>
        val us = micros(e.ts)
        val newer = us > s.last_us ||
          (us == s.last_us && e.event_id > s.last_event_id)
        s =
          if (newer) LatestState(us, e.event_id, e.event_type, s.n + 1)
          else s.copy(n = s.n + 1)
      }
      st.update(s)
      Iterator.single(LatestOut(userId, s.last_us, s.last_event_id, s.last_type, s.n))
    }
  }

  def latestPerUserWarmStart(events: Dataset[Event],
      initial: Dataset[LatestInit]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    // initial state only SEEDS the store (handleInitialState emits
    // nothing — the API can't); keys with no live traffic never reach
    // handleInputRows, so the serving layer must union the backfill
    // itself, as streamLatestWarmStartEq does
    events
      .groupByKey(_.user_id)
      .transformWithState(new LatestInitStatefulProcessor,
        TimeMode.None(), OutputMode.Update(),
        initial.groupByKey(_.user_id))
  }

  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user event-type histogram on MapState — the state primitive the
    * other tws twins don't touch: counts live as individual
    * (stateKey=user, mapKey=type) entries, so one event updates ONE map
    * entry instead of rewriting the user's whole histogram value — at
    * scale (users × types) that's the difference between O(1) and
    * O(types) state I/O per event, and RocksDB stores each entry as its
    * own key. Emits the touched entries per batch (update semantics);
    * the bridge takes the per-(user, type) max, which is the final count
    * since counts only grow. */
  class TypeHistStatefulProcessor extends StatefulProcessor[Long, Event, TypeCount] {
    @transient private var st: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("hist",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val cur = if (st.containsKey(e.event_type)) st.getValue(e.event_type) else 0L
        st.updateValue(e.event_type, cur + 1)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCount(userId, t, st.getValue(t)))
    }
  }

  def typeHistPerUser(events: Dataset[Event]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeHistStatefulProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class RecentEvent(us: Long, event_id: Long)
  case class RecentOut(user_id: Long, n_seen: Long, e1: Long, e2: Long, e3: Long)

  /** Per-user 3 most-recent events on ListState (+ a ValueState counter —
    * two independent named state variables in one processor, which the
    * old APIs' single state slot could not express without widening the
    * value). The recency buffer is a bounded merge: batch events merge
    * with the stored ≤3, the global top-3 by (event time, id) survives —
    * a SELECTION, so the final state is arrival-order independent even
    * across arbitrary micro-batch splits. Missing slots are −1 (young
    * keys), keeping the output schema flat and oracle-comparable. The
    * serving row per key is the emission with the highest n_seen. */
  class Recent3StatefulProcessor extends StatefulProcessor[Long, Event, RecentOut] {
    @transient private var top: org.apache.spark.sql.streaming.ListState[RecentEvent] = _
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[RecentEvent]("top",
        org.apache.spark.sql.Encoders.product[RecentEvent], TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[RecentOut] = {
      val batch = rows.map(e => RecentEvent(micros(e.ts), e.event_id)).toSeq
      val merged = (top.get().toSeq ++ batch)
        .sortBy(r => (-r.us, -r.event_id)).take(3)
      top.put(merged.toArray)
      val n = (if (cnt.exists()) cnt.get() else 0L) + batch.size
      cnt.update(n)
      def at(i: Int): Long = if (merged.size > i) merged(i).event_id else -1L
      Iterator.single(RecentOut(userId, n, at(0), at(1), at(2)))
    }
  }

  def recent3PerUser(events: Dataset[Event]): Dataset[RecentOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Recent3StatefulProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class HourEntry(h: Long, cnt: Long)
  case class EwmaHState(curH: Long, curCnt: Long, entries: Seq[HourEntry])
  case class EwmaOut(event_type: String, hour_ts: java.sql.Timestamp,
      cnt: Long, ewma: Double)

  /** Streaming EWMA of hourly event counts (α = 1/2, 6-hour lookback) —
    * the SEQUENTIAL-state shape none of the other stateful twins have:
    * each emitted hour depends on the running 7-hour history, so state
    * must both accumulate within a key and ROLL correctly across
    * micro-batch boundaries. One transformWithState over the raw
    * chronological event stream: per event_type the state is the open
    * hour's partial count plus the bounded deque of the last ≤7 closed
    * hours; an event in a NEW hour closes the previous one (emit), and
    * an event-time timer at the open hour's end flushes the tail once
    * the watermark (sentinel) passes it — with a staleness guard, since
    * a superseded alarm may outlive its hour. Determinism matches the
    * batch range-self-join EWMA exactly: dyadic weights 2^−k on integer
    * counts make every term and both sums exact in binary (order-free),
    * and rounding replicates Spark's round(_, 6). Requires
    * chronological replay (stageTimeOrdered), which is also the
    * production shape for a time-partitioned ingest directory. */
  class EwmaStatefulProcessor extends StatefulProcessor[String, Event, EwmaOut] {
    @transient private var st: ValueState[EwmaHState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EwmaHState]("ewma",
        org.apache.spark.sql.Encoders.product[EwmaHState], TTLConfig.NONE)

    private def hourEndMs(h: Long): Long = (h + 1) * 3600000L

    /** Close hour (h, cnt) against the deque: evict beyond the 6-hour
      * lookback, compute the dyadic-weighted EWMA over PRESENT hours. */
    private def close(key: String, s: EwmaHState): (EwmaOut, Seq[HourEntry]) = {
      val entries = (s.entries :+ HourEntry(s.curH, s.curCnt))
        .filter(_.h >= s.curH - 6)
      val num = entries.map(e => e.cnt * math.pow(0.5, (s.curH - e.h).toDouble)).sum
      val den = entries.map(e => math.pow(0.5, (s.curH - e.h).toDouble)).sum
      val ewma = BigDecimal(num / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (EwmaOut(key, new java.sql.Timestamp(s.curH * 3600000L), s.curCnt, ewma),
        entries)
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[EwmaOut] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else EwmaHState(-1L, 0L, Seq.empty)
      if (s.curH >= 0) getHandle.deleteTimer(hourEndMs(s.curH))
      var out = List.empty[EwmaOut]
      sorted.foreach { e =>
        val h = Math.floorDiv(micros(e.ts), 3600000000L)
        if (s.curH < 0) s = EwmaHState(h, 1L, s.entries)
        else if (h == s.curH) s = s.copy(curCnt = s.curCnt + 1)
        else {
          val (row, entries) = close(key, s)
          out ::= row
          s = EwmaHState(h, 1L, entries)
        }
      }
      st.update(s)
      getHandle.registerTimer(hourEndMs(s.curH))
      out.reverse.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[EwmaOut] = {
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      if (s.curH >= 0 && expiredTimerInfo.getExpiryTimeInMs() >= hourEndMs(s.curH)) {
        val (row, entries) = close(key, s)
        st.update(EwmaHState(-1L, 0L, entries))
        Iterator.single(row)
      } else Iterator.empty
    }
  }

  def ewmaHourlyTws(events: Dataset[Event]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.event_type)
      .transformWithState(new EwmaStatefulProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
