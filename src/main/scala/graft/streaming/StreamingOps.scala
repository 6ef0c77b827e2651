package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface: the engine's window/sessionize
  * operators expressed so the SAME transform runs on a batch frame or a
  * `readStream` source (Spark's unified Dataset API — a caller swaps
  * `spark.read` for `spark.readStream` and adds a sink).
  *
  * The reference is batch-only (SURVEY §1: "no streams"), so nothing
  * here ports reference behavior; it extends the engine to the streaming
  * half of the Spark API with state kept bounded:
  *  - watermarks bound event-time state for windowed aggregation,
  *  - `session_window` gives gap-based sessions with merge-on-overlap,
  *  - `flatMapGroupsWithState` demonstrates explicit custom state with
  *    processing-time timeout for semantics the built-ins can't express
  *    (the batch Sessionize's strict "gap > g stays open" edge).
  */
object StreamingOps {

  /** Sliding-window event counts per user with a watermark bounding
    * state: late events beyond `watermarkDelay` are dropped, so state
    * size is O(users × windows-in-watermark), independent of stream
    * length.
    */
  def windowedCounts(events: DataFrame, tsCol: String, userCol: String,
      windowDur: String, slideDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("n_events"))

  /** Gap-based sessions via the built-in `session_window`: windows
    * within `gap` of each other merge. Note the edge differs from the
    * batch Sessionize: an event at exactly start+gap begins a NEW
    * session here (half-open windows), while the batch operator keeps
    * it (strict >). Use `sessionizeWithState` for batch-identical edges.
    */
  def sessionWindows(events: DataFrame, tsCol: String, userCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))

  /** Streaming exact dedup for continuous corpus ingestion: emit only
    * the first occurrence of each `keyCol` (e.g. md5(text)), with state
    * bounded by the event-time watermark — `dropDuplicatesWithinWatermark`
    * evicts a key's state once the watermark passes it, so state is
    * O(keys per watermark window), not O(all keys ever seen). The batch
    * equivalent is `Dedup.dropExactDuplicates`.
    */
  def streamingDedup(docs: DataFrame, tsCol: String, keyCol: String,
      watermarkDelay: String, extraKeyCols: Seq[String] = Nil): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol +: extraKeyCols)

  /** Stream-stream interval join (the attribution shape: right events
    * matching a left event on `key` within [leftTs, leftTs + maxDelay]).
    * Both sides carry watermarks, and the join condition bounds right's
    * event time by left's, so Spark derives a state-eviction horizon for
    * BOTH join buffers: each side's state is O(events per watermark +
    * maxDelay window), independent of stream length — the condition for
    * a stream-stream join to run forever. Column names must be disjoint
    * across the two sides (rename before calling).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      maxDelay: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r, col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"))
  }

  case class Doc(doc_id: Long, key: String, ts: java.sql.Timestamp)
  case class Event(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Custom-state sessionizer (`flatMapGroupsWithState`) matching the
    * batch operator's strict-gap edge exactly: a session closes only
    * when the next event is MORE than `gapMs` after the last, or on
    * processing-time timeout. State per user is one (start, last, n)
    * triple — constant, watermark-independent.
    */
  /** @param timeout processing-time idle timeout that flushes a user's
    *                 open session, or `"none"` for NoTimeout — REQUIRED
    *                 for run-to-completion harnesses: with a
    *                 processing-time timeout registered, an AvailableNow
    *                 query keeps scheduling batches to evaluate timeouts
    *                 and `awaitTermination` never returns.
    */
  def sessionizeWithState(events: Dataset[Event], gapMs: Long,
      timeout: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (timeout == "none") GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toList.flatten
              .map(s => Session(user, s.start, s.last, s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption.toList.flatten.headOption
            val closed = scala.collection.mutable.ListBuffer[Session]()
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last <= gapMs =>
                  open = Some(SessionState(s.start, t, s.n + 1))
                case Some(s) =>
                  closed += Session(user, s.start, s.last, s.n)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach(s => state.update(List(s)))
            if (timeout != "none") state.setTimeoutDuration(timeout)
            closed.iterator
          }
      }
  }

  case class AttrEvent(user_id: Long, event_id: Long, event_type: String,
      ts: java.sql.Timestamp)
  case class Attribution(user_id: Long, purchase_id: Long,
      click_id: Option[Long], gap_us: Option[Long])

  /** Streaming as-of attribution (`flatMapGroupsWithState`): per user,
    * every `matchType` event (purchase) is matched to the LATEST
    * `sourceType` event (click) at-or-before it, optionally within a
    * `withinUs` lookback bound — the continuous mirror of the native
    * [[graft.plans.AsOfJoinNode]] backward join with tolerance, and the
    * streaming shape of attribution at 100 TB: state per user is ONE
    * (click_id, t_us) pair, constant and watermark-independent, versus
    * a stream-stream join buffering every click in the interval.
    * Emitted rows are final (append-exact) under the same in-order
    * arrival contract as [[funnelWithState]]: events sort within each
    * batch, and cross-batch state carries the latest click forward, so
    * a purchase in a later batch still sees an earlier batch's click
    * (pinned in StreamingSpec).
    *
    * LATE-DATA DISCIPLINE (the failure mode that corrupts attribution
    * at 100× is late clicks after state eviction, not happy-path
    * carry — all three behaviors pinned in `StreamingSpec`):
    *  - OUT-OF-ORDER within a batch is exact: events sort by (time,
    *    source-first, id) before processing.
    *  - ACROSS batches, a late click OLDER than the stored one is
    *    ignored (`latest` only moves forward), and rows already
    *    emitted are final — append mode never retracts. A late click
    *    older than the watermark (when `watermarkDelay` is set) is
    *    dropped by the engine before the function ever sees it.
    *  - EVICTION: with `watermarkDelay` + `evictAfterMs` set, a user's
    *    state is removed once the event-time watermark passes
    *    (stored click time + evictAfterMs) — state is then bounded by
    *    ACTIVE users in the horizon, not all users ever seen. A
    *    purchase arriving after its user's eviction gets null
    *    attribution (the documented trade of a bounded-state
    *    deployment — same no-fallback spirit as the tolerance bound).
    *    Without the knobs, state is one pair per user forever
    *    (NoTimeout) — exact, but O(all users).
    */
  def asOfWithState(events: Dataset[AttrEvent], sourceType: String,
      matchType: String, withinUs: Option[Long] = None,
      watermarkDelay: Option[String] = None,
      evictAfterMs: Option[Long] = None): Dataset[Attribution] = {
    require(evictAfterMs.isEmpty || watermarkDelay.isDefined,
      "asOfWithState: evictAfterMs needs watermarkDelay (event-time timeouts " +
        "require a watermark on ts)")
    val spark = events.sparkSession
    import spark.implicits._
    val src = watermarkDelay.map(d => events.withWatermark("ts", d)).getOrElse(events)
    val timeoutConf =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), Attribution](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[AttrEvent], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            // horizon passed with no new activity: drop the pair —
            // this is what keeps total state O(active users)
            state.remove()
            Iterator.empty
          } else {
            def us(e: AttrEvent): Long =
              e.ts.getTime / 1000L * 1000000L + e.ts.getNanos / 1000L
            var latest = state.getOption // (click_id, t_us)
            // the horizon is enforced at PROCESSING time too, not only
            // via the timeout: a user with activity in every batch never
            // times out (hasTimedOut needs a silent batch) and the
            // re-armed timeout keeps sliding forward — without this
            // check such a user's purchases would keep attributing to a
            // click arbitrarily older than evictAfterMs, and whether
            // they did would depend on batch boundaries
            evictAfterMs.foreach { ev =>
              latest = latest.filter(_._2 / 1000L + ev > state.getCurrentWatermarkMs())
            }
            val out = scala.collection.mutable.ListBuffer[Attribution]()
            // at equal timestamps the source processes FIRST: as-of ties
            // (click.ts == purchase.ts) match, exactly like the native
            // join and DuckDB ASOF
            it.toSeq.sortBy(e =>
                (us(e), if (e.event_type == sourceType) 0 else 1, e.event_id))
              .foreach { e =>
              val t = us(e)
              if (e.event_type == sourceType) {
                if (latest.forall(_._2 <= t)) latest = Some((e.event_id, t))
              } else if (e.event_type == matchType) {
                // the latest source maximizes its time, so it alone
                // decides the bound — same no-fallback rule as the
                // native tolerance join
                val hit = latest.filter { case (_, ct) =>
                  ct <= t && withinUs.forall(t - ct <= _)
                }
                out += Attribution(user, e.event_id,
                  hit.map(_._1), hit.map(t - _._2))
              }
            }
            latest match {
              case Some(st) =>
                state.update(st)
                evictAfterMs.foreach { ev =>
                  // clamp above the current watermark: a state touched in
                  // the same batch its horizon expires must still set a
                  // LEGAL timestamp (Spark rejects one at/under the
                  // watermark); it then evicts on the next advance
                  state.setTimeoutTimestamp(
                    math.max(st._2 / 1000L + ev, state.getCurrentWatermarkMs() + 1L))
                }
              case None =>
                // the stored click fell past the horizon this batch and
                // no fresh one replaced it — drop the row now instead of
                // waiting for a silent batch to fire the timeout
                if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }

  case class TypedEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  case class FunnelReach(user_id: Long, stage: Int, t_us: Long)

  /** Streaming strictly-ordered funnel (`flatMapGroupsWithState`): per
    * user, emit one append-mode row the first time each stage of
    * `stages` is reached strictly after the previous stage — the
    * continuous version of [[graft.operators.Funnel.conversion]], with
    * the same semantics per batch horizon (each emitted stage time is
    * final: a stage can only be reached once, so append mode is exact).
    * State per user is the list of reached stage times — at most
    * |stages| longs, constant and watermark-independent. Same late-data
    * caveat as [[sessionizeWithState]]: events are ordered within each
    * batch, so an AvailableNow replay is batch-equivalent.
    */
  def funnelWithState(events: Dataset[TypedEvent], stages: Seq[String]): Dataset[FunnelReach] = {
    val spark = events.sparkSession
    import spark.implicits._
    val k = stages.length
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], FunnelReach](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TypedEvent], state: GroupState[List[Long]]) =>
          // times of stages reached so far, in stage order
          var times = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[FunnelReach]()
          // exact epoch MICROS (getTime alone is millis — the table's
          // timestamps carry micros, and the oracle compares epoch_us)
          def us(e: TypedEvent): Long =
            e.ts.getTime / 1000L * 1000000L + e.ts.getNanos / 1000L
          it.toSeq.sortBy(e => (us(e), e.event_type)).foreach { e =>
            val t = us(e)
            if (times.length < k && e.event_type == stages(times.length) &&
                (times.isEmpty || t > times.last)) {
              times = times :+ t
              out += FunnelReach(user, times.length, t)
            }
          }
          if (times.nonEmpty) state.update(times)
          out.iterator
      }
  }
}
