package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming operators over the events stream: watermarked
  * windowed aggregation and stateful gap-based sessionization — the
  * streaming-native forms of the batch `Sessionize`/groupBy operators.
  *
  * Scale notes: state lives in the state store keyed by (window,
  * event_type) / user — partitioned across executors by key hash exactly
  * like a shuffle. Watermarks bound state: windows older than the
  * watermark are finalized and evicted, so state size is O(active keys ×
  * windows inside the lateness horizon), not O(stream history). The
  * session operator times out per-user state via processing-time timeout,
  * emitting closed sessions — the streaming equivalent of the batch
  * gap-rule.
  */
object EventStreams {

  /** Tumbling/sliding windowed counts+sums per event type with a
    * watermark that bounds both lateness and state retention.
    */
  def windowedTypeStats(events: DataFrame, windowLen: String = "5 minutes",
                        slide: String = "5 minutes",
                        lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessions via Spark's native `session_window` — the
    * declarative alternative to [[sessionize]]: the engine owns session
    * state/merging, the watermark closes and emits sessions. Works
    * identically over batch DataFrames (used in the spec to cross-check
    * the stateful implementation).
    */
  def sessionWindowStats(events: DataFrame, gap: String = "30 minutes",
                         lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start").cast("timestamp")).as("start_us"),
        col("n_events"), col("total_value"))

  /** Watermarked STREAM-STREAM inner join — the attribution query: each
    * view joined to the same user's purchases landing within `horizon`
    * after it. The explicit time-range predicate plus both-side watermarks
    * are what make this runnable forever: Spark derives each side's state
    * retention from them (a buffered view is evictable once the watermark
    * passes `view_ts + horizon`; a purchase once it can no longer match
    * any live view), so join state is O(events inside the horizon), not
    * O(stream history). Without the range bound a stream-stream join
    * buffers both streams unboundedly — the state-blowup trap this
    * operator exists to demonstrate avoiding.
    *
    * Inner-join results emit as soon as they match (append mode, no
    * watermark hold-back), and the same code runs on batch frames, where
    * `withWatermark` is a no-op — the spec cross-checks stream ≡ batch.
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
                      horizon: String = "1 hour",
                      lateness: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", lateness)
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("event_id").as("purchase_id"), col("user_id").as("purchase_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    v.join(p,
        col("user_id") === col("purchase_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
        "inner")
      .drop("purchase_user")
  }

  /** Streaming exact dedup: drop repeated `keyCols` rows, with the
    * watermark bounding how long a key's dedup state is retained — the
    * streaming form of D1 (and of exact document dedup) whose state does
    * not grow with stream history.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Sliding-window distinct actives (rolling DAU/WAU), streaming form.
    * Streaming aggregation disallows COUNT(DISTINCT) for a reason: its
    * state IS the per-window value set, unbounded in the key cardinality.
    * The streaming answer is the mergeable sketch — `approx_count_distinct`
    * keeps one fixed-size HLL register array per open window, watermark
    * bounds how many windows stay open, and register max-merge is
    * order-insensitive, so the result is deterministic and identical
    * between a stream and the same code over a batch frame (cross-checked
    * in StreamingSpec). The EXACT rolling count is the batch operator
    * ([[graft.ops.RollingDistinct.activeKeys]]) — this is the live
    *-dashboard view of the same question, within HLL error (`rsd`).
    */
  def rollingActiveSketch(events: DataFrame, windowDays: Int = 7,
                          lateness: String = "1 day",
                          rsd: Double = 0.05): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be >= 1")
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), s"$windowDays days", "1 day"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("active_approx"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("active_approx"))
  }

  /** A CDC change on the wire: key, change-log position, op ∈ I/U/D,
    * payload.
    */
  case class Change(key: Long, seq: Long, op: String, payload: Double)

  /** A key's current state after applying the winners seen so far. */
  case class KeyState(key: Long, seq: Long, op: String, payload: Double,
                      deleted: Boolean)

  /** Streaming CDC latest-state — the streaming form of
    * [[graft.ops.Merge.applyChanges]]: per key, keep the winning change
    * ((seq, op) descending, the exact batch winner rule) across
    * micro-batches and emit the key's updated current state whenever a
    * batch changes it (`deleted = true` when a D wins — the downstream
    * sink's tombstone).
    *
    * State is one (seq, op, payload) triple per key — the DIMENSION key
    * population, not stream history — so no timeout is attached: a CDC
    * state store must remember every live key forever by definition
    * (retiring keys is the upstream's D, not a watermark's guess).
    */
  def cdcLatest(spark: SparkSession, changes: Dataset[Change]): Dataset[KeyState] = {
    import spark.implicits._
    def winner(a: (Long, String, Double), b: (Long, String, Double)) =
      if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b else a
    changes.groupByKey(_.key)
      .mapGroupsWithState[(Long, String, Double), KeyState](
        GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        val incoming = rows.map(c => (c.seq, c.op, c.payload))
          .reduce((a, b) => winner(a, b))
        val merged = state.getOption.map(winner(_, incoming)).getOrElse(incoming)
        state.update(merged)
        KeyState(key, merged._1, merged._2, merged._3, merged._2 == "D")
      }
  }

  /** One event on the wire. */
  case class Ev(event_id: Long, user_id: Long, tsUs: Long, value: Double)

  /** Accumulating per-user session state. */
  case class SessionState(startUs: Long, lastUs: Long, n: Long, total: Double)

  /** A closed session, emitted when the gap rule fires (or state times
    * out between micro-batches).
    */
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long, total_value: Double)

  /** Stateful gap-based sessionization via flatMapGroupsWithState: events
    * for a user extend the open session while gaps stay ≤ `gapSeconds`; a
    * larger gap closes and emits the previous session. Within a
    * micro-batch events arrive unordered → sort the batch's slice before
    * folding (bounded by batch size, not stream size).
    *
    * The open tail session stays in state awaiting more events. In 24/7
    * production deployments pass `GroupStateTimeout.ProcessingTimeTimeout`
    * and handle `state.hasTimedOut` to flush idle users; the `NoTimeout`
    * default keeps finite-input runs (Trigger.AvailableNow, tests)
    * deterministic — a pending timeout otherwise keeps the query's batch
    * executor alive past the drained input.
    */
  def sessionize(spark: SparkSession, events: Dataset[Ev], gapSeconds: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout()): Dataset[ClosedSession] = {
    import spark.implicits._
    // EventTimeTimeout needs a watermarked TimestampType column, which this
    // Long-micros encoding deliberately doesn't carry — reject rather than
    // fail at query start with an opaque AnalysisException.
    require(timeout != GroupStateTimeout.EventTimeTimeout(),
      "sessionize supports NoTimeout (finite inputs) or ProcessingTimeTimeout (24/7); " +
        "EventTimeTimeout needs a watermark on a timestamp column — use sessionWindowStats instead")
    val gapUs = gapSeconds * 1000000L

    def fold(user: Long, evs: Iterator[Ev],
             state: GroupState[SessionState]): Iterator[ClosedSession] = {
      val closed = Seq.newBuilder[ClosedSession]
      if (state.hasTimedOut) { // only reachable with a timeout conf
        state.getOption.foreach(s =>
          closed += ClosedSession(user, s.startUs, s.lastUs, s.n, s.total))
        state.remove()
      } else {
        val sorted = evs.toSeq.sortBy(e => (e.tsUs, e.event_id))
        var cur = state.getOption
        sorted.foreach { e =>
          cur match {
            case Some(s) if e.tsUs - s.lastUs <= gapUs =>
              cur = Some(SessionState(s.startUs, e.tsUs, s.n + 1, s.total + e.value))
            case Some(s) =>
              closed += ClosedSession(user, s.startUs, s.lastUs, s.n, s.total)
              cur = Some(SessionState(e.tsUs, e.tsUs, 1, e.value))
            case None =>
              cur = Some(SessionState(e.tsUs, e.tsUs, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
            state.setTimeoutDuration(gapSeconds * 1000)
        }
      }
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fold)
  }

  /** The same gap-rule fold shared by both stateful sessionizers: fold a
    * (batch-sorted) slice of one user's events into the open session,
    * emitting sessions closed by the gap rule.
    */
  private def foldSlice(user: Long, sorted: Seq[Ev], open: Option[SessionState],
                        gapUs: Long): (Seq[ClosedSession], Option[SessionState]) = {
    val closed = Seq.newBuilder[ClosedSession]
    var cur = open
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.tsUs - s.lastUs <= gapUs =>
          cur = Some(SessionState(s.startUs, e.tsUs, s.n + 1, s.total + e.value))
        case Some(s) =>
          closed += ClosedSession(user, s.startUs, s.lastUs, s.n, s.total)
          cur = Some(SessionState(e.tsUs, e.tsUs, 1, e.value))
        case None =>
          cur = Some(SessionState(e.tsUs, e.tsUs, 1, e.value))
      }
    }
    (closed.result(), cur)
  }

  /** Gap-based sessionization on Spark 4's `transformWithState` API — the
    * successor to [[sessionize]]'s `flatMapGroupsWithState`: typed state
    * handles (`ValueState`), explicit per-key timers instead of a single
    * timeout mode, and the RocksDB state store (required by the operator;
    * set `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider`) whose changelog checkpointing
    * is what keeps multi-TB session state restorable at 100 TB scale.
    *
    * `idleFlushMs > 0` registers a processing-time timer that flushes a
    * user's open session after that much idle wall-clock time (24/7
    * deployments); `0` leaves tails in state — deterministic for finite
    * inputs, mirroring [[sessionize]]'s NoTimeout default.
    */
  class SessionProcessor(gapSeconds: Long, idleFlushMs: Long)
      extends StatefulProcessor[Long, Ev, ClosedSession] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[ClosedSession] = {
      // within a micro-batch events arrive unordered → sort the slice
      // (bounded by batch size, not stream size), as in sessionize
      val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.event_id))
      val open = if (session.exists()) Some(session.get()) else None
      val (closed, cur) = foldSlice(user, sorted, open, gapSeconds * 1000000L)
      cur.foreach { s =>
        session.update(s)
        if (idleFlushMs > 0)
          getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs + idleFlushMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val out = (if (session.exists()) {
        val s = session.get()
        Seq(ClosedSession(user, s.startUs, s.lastUs, s.n, s.total))
      } else Seq.empty).iterator
      session.clear()
      out
    }
  }

  /** [[SessionProcessor]] wired onto a typed event stream. Requires the
    * RocksDB state store provider (see the processor's scaladoc).
    *
    * TimeMode follows the timer need: `ProcessingTime` only when an idle
    * flush is requested — an unconditional ProcessingTime mode keeps a
    * `Trigger.AvailableNow` run alive after the input drains (the operator
    * waits on the clock), exactly the hang class the old API's NoTimeout
    * default avoids.
    */
  def sessionizeTws(spark: SparkSession, events: Dataset[Ev], gapSeconds: Long,
                    idleFlushMs: Long = 0L): Dataset[ClosedSession] = {
    import spark.implicits._
    val timeMode = if (idleFlushMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds, idleFlushMs),
        timeMode, OutputMode.Append())
  }
}
