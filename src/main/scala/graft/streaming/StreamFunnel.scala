package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming ordered-funnel (CEP-lite) — the continuous counterpart
  * of the batch `EventQueries.funnel`: per user, first signup, first
  * view at-or-after that signup, first purchase at-or-after that
  * view, and the furthest stage reached.
  *
  * Shape: events are keyed by user; each user's state buffers the
  * (type, event-time) pairs seen so far, and on every micro-batch the
  * funnel is recomputed over the buffer with EXACTLY the batch
  * algorithm — so out-of-order arrival (a signup that shows up after
  * the view it legitimizes) converges to the same answer the batch
  * query gives, instead of whatever a forward-only state machine
  * happened to lock in. A row is emitted whenever the user's funnel
  * snapshot changes ("latest row per user wins" downstream).
  *
  * Scale/state design: state is per user — the natural shard key, so
  * a 1000-executor cluster spreads it like any keyed aggregation. The
  * buffer is capped at `maxEvents` (an adversarially chatty user
  * saturates — further events are dropped and the row is flagged
  * `saturated` — instead of growing state without bound; funnel-
  * relevant event streams are small per user by construction), and
  * the whole entry expires `delay` after the newest event seen
  * (event-time timeout against the watermark), keeping total state
  * O(active users), not O(history). */
object StreamFunnel {

  case class Ev(user_id: Long, event_type: String, ts: Timestamp)
  /** Funnel snapshot as epoch millis (None = stage not reached). */
  private type Snap = (Long, Long, Option[Long], Option[Long])
  case class FunnelState(events: List[(String, Long)], saturated: Boolean,
      lastEmitted: Option[Snap])
  case class FunnelRow(user_id: Long, stage: Long, signup_ts: Timestamp,
      view_ts: Option[Timestamp], purchase_ts: Option[Timestamp],
      saturated: Boolean)

  /** Exact funnel over a (type, epochMillis) multiset — the batch
    * `EventQueries.funnel` semantics. None when the user never
    * signed up (such users are not in the funnel at all). */
  private[streaming] def compute(events: Seq[(String, Long)]): Option[Snap] = {
    val signups = events.collect { case ("signup", t) => t }
    if (signups.isEmpty) None
    else {
      val s = signups.min
      val v = events.collect { case ("view", t) if t >= s => t }
        .minOption
      val p = v.flatMap(vt =>
        events.collect { case ("purchase", t) if t >= vt => t }.minOption)
      val stage = if (p.isDefined) 3L else if (v.isDefined) 2L else 1L
      Some((stage, s, v, p))
    }
  }

  /** Funnel-update stream: one row per user per snapshot CHANGE (the
    * latest row per user is the current funnel position). Works on a
    * batch frame too (tests, backfills) — there it emits exactly one
    * row per signed-up user, matching `EventQueries.funnel`. */
  def funnelUpdates(stream: DataFrame, delay: String = "1 hour",
      maxEvents: Int = 1024)(implicit spark: SparkSession): Dataset[FunnelRow] = {
    import spark.implicits._
    val isStreaming = stream.isStreaming
    val base = stream.select(
      col("user_id").cast("long").as("user_id"),
      col("event_type").cast("string").as("event_type"),
      col("ts").cast("timestamp").as("ts"))
    val typed = (if (isStreaming) base.withWatermark("ts", delay) else base)
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .as[Ev]

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append,
        if (isStreaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(FunnelState(Nil, saturated = false, None))
            // deterministic in-batch order regardless of shuffle arrival
            val incoming = it.map(e => (e.event_type, e.ts.getTime)).toList
              .sortBy { case (t, ms) => (ms, t) }
            val room = math.max(0, maxEvents - prev.events.size)
            val kept = incoming.take(room)
            val saturated = prev.saturated || kept.size < incoming.size
            val events = prev.events ++ kept
            val snapshot = compute(events)
            // emit on snapshot change OR on the saturation transition:
            // a buffer that fills can never change its snapshot again,
            // so without the second clause the saturated=true flag
            // would never reach downstream ("latest row wins" would
            // show a silently-lossy user as clean forever).
            val saturationFlip = saturated && !prev.saturated
            val out = snapshot match {
              case Some(snap @ (stage, s, v, p))
                  if !prev.lastEmitted.contains(snap) || saturationFlip =>
                Iterator(FunnelRow(uid, stage, new Timestamp(s),
                  v.map(new Timestamp(_)), p.map(new Timestamp(_)), saturated))
              case _ => Iterator.empty
            }
            state.update(FunnelState(events, saturated,
              snapshot.orElse(prev.lastEmitted)))
            // batch runs have no watermark to time out against —
            // timeouts are a streaming-only concern
            if (isStreaming && events.nonEmpty)
              state.setTimeoutTimestamp(events.map(_._2).max, delay)
            out
          }
      }
  }
}
