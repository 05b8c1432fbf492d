package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-ready event transforms. Each takes a plain
  * DataFrame of (ts: timestamp, user_id, event_type, value) and is
  * valid on BOTH a batch read and a `readStream` source — the batch
  * queries in [[graft.queries.EventQueries]] and the streaming tests
  * share the same code path, which is the Spark-native way to keep
  * batch/stream semantics aligned.
  *
  * For streams, call [[withEventTimeWatermark]] first so state for
  * tumbling/session windows can be reclaimed and late data dropped
  * deterministically. */
object EventStreams {

  /** Late-data bound for streaming state cleanup. */
  def withEventTimeWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)

  /** Tumbling 1-hour aggregate per event type (streaming-safe: pure
    * windowed aggregation). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessions via the native session_window operator —
    * events within `gap` of each other merge into one session. Works
    * identically on batch and watermarked streams (stateful merge
    * under the hood). */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming volume-anomaly flags — the continuous twin of
    * [[graft.queries.EventQueries.anomalies]]: hourly counts per type
    * (tumbling window, streaming-safe) joined against a BATCH-derived
    * per-type baseline (mean/std of the historical hourly
    * distribution), emitting windows whose |z| clears the threshold.
    * The baseline is a tiny static frame (one row per type) →
    * broadcast to the stream; splitting "stats from history, scoring
    * on the stream" is exactly how a production monitor runs — the
    * baseline refreshes on a slow cadence while scoring is per
    * micro-batch, and no unbounded state accumulates beyond the
    * watermarked hour windows. */
  def anomalies(events: DataFrame, baseline: DataFrame,
      zThreshold: Double = 2.0): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(baseline.select("event_type", "mean", "std")),
        "event_type")
      .withColumn("z",
        (col("n").cast("double") - col("mean")) / nullif(col("std"), lit(0.0)))
      .filter(abs(col("z")) > zThreshold)
      .select(col("event_type"), col("w.start").as("window_start"),
        col("n"), round(col("z"), 6).as("z"))

  /** Stream-stream interval join — the streaming twin of
    * [[graft.ext.RangeJoin]]: each left row joined to right rows of
    * the same key with `rightTs` in `[leftTs - lowerSec, leftTs]`.
    * On streams, BOTH sides must be watermarked first
    * ([[withEventTimeWatermark]]); the time-range condition lets Spark
    * bound the join state to interval + watermark delay instead of
    * keeping both streams forever. On batch DataFrames the same plan
    * runs as a plain join — one code path, both semantics. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lowerSec: Long): DataFrame = {
    val r = right.withColumnRenamed(keyCol, s"_r_$keyCol")
    left.join(r,
      col(keyCol) === col(s"_r_$keyCol") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerSec SECONDS") &&
        col(rightTs) <= col(leftTs))
      .drop(s"_r_$keyCol")
  }
}
