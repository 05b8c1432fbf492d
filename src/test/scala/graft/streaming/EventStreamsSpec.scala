package graft.streaming

import graft.dedup.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Batch/stream equivalence: the same EventStreams transforms must
  * produce identical results from a MemoryStream as from a batch
  * DataFrame over the same rows. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val rows = Seq(
    // user 1: two sessions (gap 45 min between minute 20 and 65)
    (1L, ts(0), "click", 1.0), (1L, ts(10), "click", 2.0), (1L, ts(20), "buy", 3.0),
    (1L, ts(65), "click", 4.0), (1L, ts(70), "click", 5.0),
    // user 2: one session
    (2L, ts(5), "view", 10.0), (2L, ts(25), "view", 20.0))

  test("streaming tumbling counts equal batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = EventStreams.tumblingCounts(
      EventStreams.withEventTimeWatermark(streamDf))
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val batch = EventStreams.tumblingCounts(
      rows.toDF("user_id", "ts", "event_type", "value"))
      .orderBy("window_start", "event_type").collect().toSeq
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming session windows equal batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = EventStreams.sessions(
      EventStreams.withEventTimeWatermark(streamDf))
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val batch = EventStreams.sessions(rows.toDF("user_id", "ts", "event_type", "value"))
      .orderBy("user_id", "session_start").collect().toSeq
    val streamed = spark.table("sessions_out")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
    // user 1 split into 2 sessions, user 2 one session
    assert(batch.count(_.getLong(0) == 1L) == 2)
    assert(batch.count(_.getLong(0) == 2L) == 1)
  }

  test("session_window merges an event landing EXACTLY gap after the previous") {
    // Spark's session windows are [ts, ts+gap) per event, and
    // ADJACENT windows merge: an event at prev + 30min (the gap)
    // extends the session; only a strictly larger gap splits. The
    // events fuzzer caught the DuckDB twin splitting on >= — this
    // pins the Spark-side semantics the twin now mirrors with
    // strict >.
    import spark.implicits._
    val exact = Seq(
      (1L, ts(0), "click", 1.0),
      (1L, ts(30), "click", 1.0),   // exactly gap later: SAME session
      (1L, ts(61), "click", 1.0))   // 31 min later: NEW session
    val got = EventStreams.sessions(
      exact.toDF("user_id", "ts", "event_type", "value"))
      .orderBy("session_start").collect()
    assert(got.length == 2, got.mkString("; "))
    assert(got(0).getLong(3) == 2L, s"first session must hold both boundary events: ${got(0)}")
    assert(got(1).getLong(3) == 1L)
  }

  test("streaming anomaly flags equal the batch query against the same baseline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 23 quiet hours at 2 clicks + one 40-click spike hour
    val anomalyRows =
      (0 until 23).flatMap(h => Seq(
        (1L, ts(h * 60 + 10), "click", 1.0), (2L, ts(h * 60 + 20), "click", 1.0))) ++
        (1 to 40).map(u => (u.toLong, ts(23 * 60 + 30), "click", 1.0))
    val batchDf = anomalyRows.toDF("user_id", "ts", "event_type", "value")
    val baseline = graft.queries.EventQueries.hourlyBaseline(batchDf)

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = EventStreams.anomalies(
      EventStreams.withEventTimeWatermark(streamDf), baseline)
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("complete").start()
    mem.addData(anomalyRows: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("anomaly_out")
      .select(col("event_type"),
        (col("window_start").cast("long") / 3600L).cast("long").as("hour"),
        col("n"), col("z"))
      .orderBy("event_type", "hour").collect().toSeq
    val batch = graft.queries.EventQueries.anomalies(batchDf)
      .orderBy("event_type", "hour").collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
    // exactly the spike hour, in both
    assert(batch.size == 1 && batch.head.getLong(2) == 40L)
  }
}
