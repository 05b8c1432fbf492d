package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series operators over the events table: tumbling
  * windows, gap sessionization, JSON extraction. Window starts are
  * emitted as formatted strings so TIMESTAMP_NTZ/NS precision
  * differences between engines can't leak into the compare. The same
  * transforms run unchanged under Structured Streaming (see
  * graft.streaming). */
object EventQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1-hour windows per event type.
    "events_tumbling" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("total_value"))
        .select(
          date_format(col("w.start"), TsFmt).as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")),

    // gap-based sessionization (30-min inactivity): lag + running sum
    // of session-break flags, then per-session aggregates.
    "events_sessions" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_seq")
        .agg(
          date_format(min(col("ts")), TsFmt).as("session_start"),
          count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("total_value"))
        .orderBy("user_id", "session_seq")
    }),

    // sliding 1-hour windows every 15 minutes: each event lands in 4
    // overlapping windows.
    "events_sliding" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("total_value"))
        .select(date_format(col("w.start"), TsFmt).as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")),

    // native session_window operator (streaming-capable path from
    // graft.streaming.EventStreams) validated against the lag-based
    // sessionization oracle.
    "events_session_native" -> ((s, dir) =>
      graft.streaming.EventStreams.sessions(Tables.events(s, dir))
        .select(col("user_id"),
          date_format(col("session_start"), TsFmt).as("session_start"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start")),

    // as-of join: each purchase looked up against the user's most
    // recent signup (point-in-time correctness — validated against
    // DuckDB's NATIVE ASOF JOIN as the oracle).
    "events_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
      graft.ext.AsOf.asofJoin(purchases, signups,
        keyCols = Seq("user_id"), tsCol = "ts", valueCols = Seq("signup_ts"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TsFmt).as("ts"),
          date_format(col("asof_signup_ts"), TsFmt).as("signup_ts"),
          (col("ts").cast("long") - col("asof_signup_ts").cast("long"))
            .as("secs_since_signup"))
        .orderBy("event_id")
    }),

    // bucketed range join (graft.ext.RangeJoin): per click, the
    // user's views in the preceding 30 minutes — an equi-join on
    // (user, time-bucket) with a residual range filter instead of the
    // nested-loop a naive non-equi join degenerates to. DECIMAL sum
    // for aggregation-order independence.
    "events_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("value").as("view_value"))
      graft.ext.RangeJoin.rangeJoin(clicks, views, Seq("user_id"),
        "ts", "view_ts", lowerSec = 1800L, upperSec = 0L)
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_views"),
          sum(col("view_value").cast("decimal(18,2)")).cast("double")
            .as("view_value_sum"))
        .orderBy("event_id")
    }),

    // JSON scalar extraction + histogram over the extracted value.
    // try_cast, not cast: props is arbitrary user payload, and under
    // ANSI mode a single non-numeric k ('{"k": "xyz"}') would abort
    // the whole scan — the fuzzer caught exactly that. NULL k (junk
    // JSON, missing key, JSON null) groups into the NULL bucket in
    // both engines.
    "events_json" -> ((s, dir) =>
      // Tables.spread: the per-row JSON-path parse is the one
      // cpu-heavy scan stage in this family — off the single test-SF
      // split it ran serially (guide §2.4; gated no-op at scale)
      Tables.spread(Tables.events(s, dir), "event_id")
        .select(get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .groupBy(floor(col("k") / 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k_bucket")),

    // multi-stage conversion funnel: each user's first signup, first
    // view at-or-after that signup, first purchase at-or-after that
    // view — ordered-sequence analysis as three min-aggregations +
    // two equi-joins, all keyed on user_id so the shuffle
    // partitioning is reused across every stage; no window scans the
    // raw event stream.
    "events_funnel" -> ((s, dir) =>
      funnel(Tables.events(s, dir))
        .select(col("user_id"),
          date_format(col("signup_ts"), TsFmt).as("signup_ts"),
          date_format(col("view_ts"), TsFmt).as("view_ts"),
          date_format(col("purchase_ts"), TsFmt).as("purchase_ts"),
          col("stage"))
        .orderBy("user_id")),

    // weekly cohort retention: cohort = the user's first active epoch
    // week; one row per (cohort, week offset) with the distinct users
    // still active. Epoch-week arithmetic (not calendar truncation)
    // so both engines bucket identically regardless of week-origin
    // conventions.
    "events_retention" -> ((s, dir) =>
      retention(Tables.events(s, dir))
        .orderBy("cohort_w", "week_offset")),

    // volume-anomaly detection: hourly event counts per type, flagged
    // where |z| > 2 against the type's own hourly distribution. The
    // moments come from EXACT integer sums (n, Σx, Σx²) so the
    // derived doubles are bit-identical cross-engine — never from
    // stddev_samp, whose float accumulation is partition-order
    // dependent. Per-type stats are one row per type → broadcast back.
    "events_anomaly" -> ((s, dir) =>
      anomalies(Tables.events(s, dir)).orderBy("event_type", "hour"))
  )

  private def hourlyCounts(ev: DataFrame): DataFrame = ev
    .groupBy(col("event_type"),
      floor(col("ts").cast("long") / 3600L).cast("long").as("hour"))
    .agg(count(lit(1)).as("n"))

  /** Per-type (mean, std) of an hourly-count frame. Moments from
    * exact integer sums so the derived doubles are partition-order
    * independent. Two NaN traps are closed here: a type seen in only
    * ONE hour has a 0/0 sample variance (n_hours-1 = 0) and is
    * excluded — one observation has no distribution to deviate from —
    * and the sum_sq - sum²/n cancellation is clamped at 0 so large
    * counts can never produce sqrt(-ε) = NaN. (NaN matters doubly:
    * both engines order NaN ABOVE every number, so a NaN std would
    * flag EVERY hour of that type.) */
  private def baselineOf(hourly: DataFrame): DataFrame =
    hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum(col("n")).as("sum_n"),
        sum(col("n") * col("n")).as("sum_sq"))
      .filter(col("n_hours") >= 2)
      .withColumn("mean",
        col("sum_n").cast("double") / col("n_hours").cast("double"))
      .withColumn("std", sqrt(greatest(lit(0.0),
        (col("sum_sq").cast("double")
          - col("sum_n").cast("double") * col("sum_n").cast("double")
            / col("n_hours").cast("double"))
          / (col("n_hours").cast("double") - 1.0))))
      .select("event_type", "mean", "std")

  /** Per-type (mean, std) of the hourly count distribution — the
    * baseline both the batch anomaly query and the streaming monitor
    * ([[graft.streaming.EventStreams.anomalies]]) score against. */
  def hourlyBaseline(ev: DataFrame): DataFrame =
    baselineOf(hourlyCounts(ev))

  /** Volume-anomaly core: hourly counts per type, |z| > 2 against the
    * type's own hourly distribution. The hourly frame is materialized
    * once (localCheckpoint — it is types × hours, tiny at any corpus
    * size) and feeds BOTH the baseline and the scoring join, so the
    * raw events table is scanned once, not twice. */
  def anomalies(ev: DataFrame, zThreshold: Double = 2.0): DataFrame = {
    val hourly = hourlyCounts(ev).localCheckpoint(true)
    // nullif guard: a flat series has std = 0 and 0/0 = NaN — null z
    // drops out of the filter in both engines instead.
    hourly.join(broadcast(baselineOf(hourly)), "event_type")
      .withColumn("z",
        (col("n").cast("double") - col("mean")) / nullif(col("std"), lit(0.0)))
      .filter(abs(col("z")) > zThreshold)
      .select(col("event_type"), col("hour"), col("n"),
        round(col("z"), 6).as("z"))
  }

  /** Ordered-funnel core: per user, first signup, first view
    * at-or-after that signup, first purchase at-or-after that view,
    * plus the furthest stage reached (1/2/3). All three aggregations
    * and both joins key on user_id — one shuffle partitioning reused
    * end to end. */
  def funnel(ev: DataFrame): DataFrame = {
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
    val view = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
      .join(signup, Seq("user_id"))
      .filter(col("vts") >= col("signup_ts"))
      .groupBy("user_id").agg(min(col("vts")).as("view_ts"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
      .join(view, Seq("user_id"))
      .filter(col("pts") >= col("view_ts"))
      .groupBy("user_id").agg(min(col("pts")).as("purchase_ts"))
    signup
      .join(view, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"), col("view_ts"),
        col("purchase_ts"),
        when(col("purchase_ts").isNotNull, lit(3L))
          .when(col("view_ts").isNotNull, lit(2L))
          .otherwise(lit(1L)).as("stage"))
  }

  /** Weekly cohort retention core: cohort = first active epoch week,
    * one row per (cohort, week offset) with distinct active users. */
  def retention(ev: DataFrame): DataFrame = {
    val week = floor(col("ts").cast("long") / 604800L).cast("long")
    val userWeeks = ev.select(col("user_id"), week.as("w")).distinct()
    val cohorts = userWeeks.groupBy("user_id")
      .agg(min(col("w")).as("cohort_w"))
    userWeeks.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val oracle: Map[String, String] = Map(
    "events_range_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts
        |  FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts AS view_ts, value
        |  FROM events WHERE event_type = 'view')
        |SELECT c.event_id, count(*) AS n_views,
        |       CAST(sum(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE) AS view_value_sum
        |FROM clicks c JOIN views v
        |  ON c.user_id = v.user_id
        | AND v.view_ts >= c.ts - INTERVAL 1800 SECOND
        | AND v.view_ts <= c.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_sliding" ->
      """WITH expanded AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS wstart,
        |         event_type, value
        |  FROM events
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
        |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM expanded GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // strict `>`: Spark's session_window treats an event landing
    // EXACTLY at the previous event's ts + gap as part of the same
    // session (adjacent [ts, ts+gap) windows merge) — the events
    // fuzzer caught the old `>=` splitting those. The running sum
    // orders by (ts, event_id) like the lag window: a ts-only ROWS
    // frame is nondeterministic on same-(user, ts) ties.
    "events_session_native" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY 1, 2""".stripMargin,

    "events_asof" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), signups AS (
        |  SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup'
        |)
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
        |       CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(s.signup_ts)) AS BIGINT)
        |         AS secs_since_signup
        |FROM purchases p
        |ASOF LEFT JOIN signups s
        |  ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |ORDER BY event_id""".stripMargin,

    // json_valid guard + TRY_CAST mirror the Spark side's
    // null-on-junk semantics (get_json_object → NULL on malformed
    // JSON; try_cast → NULL on non-numeric k): DuckDB's
    // json_extract_string ERRORS on malformed JSON and plain CAST
    // errors on 'xyz', both caught by the events fuzzer
    "events_json" ->
      """SELECT CAST(floor(TRY_CAST(CASE WHEN json_valid(props)
        |         THEN json_extract_string(props, '$.k') END AS BIGINT) / 10) AS BIGINT) AS k_bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "events_funnel" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |vw AS (
        |  SELECT e.user_id, min(e.ts) AS view_ts
        |  FROM events e JOIN su USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts >= su.signup_ts
        |  GROUP BY 1),
        |pu AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN vw USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= vw.view_ts
        |  GROUP BY 1)
        |SELECT su.user_id,
        |  strftime(su.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
        |  strftime(vw.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        |  strftime(pu.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  CAST(CASE WHEN pu.user_id IS NOT NULL THEN 3
        |            WHEN vw.user_id IS NOT NULL THEN 2
        |            ELSE 1 END AS BIGINT) AS stage
        |FROM su
        |LEFT JOIN vw USING (user_id)
        |LEFT JOIN pu USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "events_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 604800) AS BIGINT) AS w
        |  FROM events),
        |co AS (SELECT user_id, min(w) AS cohort_w FROM uw GROUP BY 1)
        |SELECT co.cohort_w, uw.w - co.cohort_w AS week_offset,
        |       count(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN co USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) AS BIGINT) AS hour,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type,
        |    CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
        |    sqrt(greatest(0.0, (CAST(sum(n * n) AS DOUBLE)
        |          - CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)
        |            / CAST(count(*) AS DOUBLE))
        |         / (CAST(count(*) AS DOUBLE) - 1.0))) AS std
        |  FROM hourly GROUP BY 1
        |  HAVING count(*) >= 2)
        |SELECT h.event_type, h.hour, h.n,
        |       round((CAST(h.n AS DOUBLE) - s.mean) / nullif(s.std, 0), 6) AS z
        |FROM hourly h JOIN stats s USING (event_type)
        |WHERE abs((CAST(h.n AS DOUBLE) - s.mean) / nullif(s.std, 0)) > 2.0
        |ORDER BY h.event_type, h.hour""".stripMargin
  )
}
