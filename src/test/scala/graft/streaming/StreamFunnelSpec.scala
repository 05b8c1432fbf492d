package graft.streaming

import graft.dedup.SparkTest
import graft.queries.EventQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def ts(s: Long) = new Timestamp(s * 1000)

  /** (user, type, epochSec) triples → events frame. */
  private def frame(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("user_id", "event_type", "epoch")
      .withColumn("ts", col("epoch").cast("timestamp"))
      .select("user_id", "event_type", "ts")
  }

  private val mixed = Seq(
    (1L, "signup", 100L), (1L, "view", 200L), (1L, "purchase", 300L),
    (2L, "view", 50L), (2L, "signup", 100L), (2L, "purchase", 200L),
    (3L, "signup", 100L), (3L, "purchase", 150L), (3L, "view", 400L),
    (4L, "view", 100L), (4L, "purchase", 200L),
    (5L, "signup", 100L))

  test("batch mode matches EventQueries.funnel exactly") {
    implicit val s = spark
    val ev = frame(mixed)
    val got = StreamFunnel.funnelUpdates(ev).collect()
      .map(r => (r.user_id, r.stage, r.signup_ts,
        r.view_ts.orNull, r.purchase_ts.orNull)).toSet
    val want = EventQueries.funnel(ev).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getTimestamp(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == want)
    assert(got.map(_._1) == Set(1L, 2L, 3L, 5L)) // user 4 never signed up
  }

  test("out-of-order arrival converges to the batch answer") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF().toDF("user_id", "event_type", "ts")
    val q = StreamFunnel.funnelUpdates(df)
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode("append").start()
    // purchase and view arrive BEFORE the signup that legitimizes them
    mem.addData((7L, "purchase", ts(300)), (7L, "view", ts(200)))
    q.processAllAvailable()
    mem.addData((7L, "signup", ts(100)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_ooo")
      .orderBy("signup_ts").collect()
    // nothing until the signup lands; then the full stage-3 snapshot
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 3L)
    assert(r.getTimestamp(2) == ts(100))
    assert(r.getTimestamp(3) == ts(200))
    assert(r.getTimestamp(4) == ts(300))
  }

  test("snapshot upgrades emit one row per change, latest row wins") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF().toDF("user_id", "event_type", "ts")
    val q = StreamFunnel.funnelUpdates(df)
      .writeStream.format("memory").queryName("funnel_upg")
      .outputMode("append").start()
    mem.addData((8L, "signup", ts(100)))
    q.processAllAvailable()
    mem.addData((8L, "view", ts(150)))
    q.processAllAvailable()
    // an EARLIER view (still ≥ signup) refines the stage-2 snapshot
    mem.addData((8L, "view", ts(120)), (8L, "purchase", ts(130)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_upg").collect()
      .map(r => (r.getLong(1), r.getTimestamp(3), r.getTimestamp(4)))
    assert(rows.length == 3)
    assert(rows.map(_._1).toSeq.sorted == Seq(1L, 2L, 3L))
    // final snapshot: view 120, purchase 130
    val last = rows.find(_._1 == 3L).get
    assert(last._2 == ts(120) && last._3 == ts(130))
  }

  test("saturation transition emits even when the snapshot cannot change") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF().toDF("user_id", "event_type", "ts")
    val q = StreamFunnel.funnelUpdates(df, maxEvents = 4)
      .writeStream.format("memory").queryName("funnel_sat")
      .outputMode("append").start()
    mem.addData((11L, "signup", ts(100)), (11L, "view", ts(200)))
    q.processAllAvailable()
    // 5 more views: 2 fit the buffer, 3 drop — the funnel snapshot is
    // unchanged (first view stays 200) but the row must re-emit with
    // saturated=true or downstream would show the user as clean forever
    mem.addData((300L to 700L by 100L).map(t => (11L, "view", ts(t))): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_sat").orderBy("saturated").collect()
    assert(rows.length == 2)
    assert(!rows(0).getBoolean(5) && rows(1).getBoolean(5))
    // same snapshot on both rows — only the flag changed
    assert(rows(0).getTimestamp(3) == ts(200) && rows(1).getTimestamp(3) == ts(200))
  }

  test("maxEvents cap bounds state and flags saturation") {
    implicit val s = spark
    val chatty = (1L to 50L).map(i => (9L, "view", 100L + i)) :+
      ((9L, "signup", 10L))
    val got = StreamFunnel.funnelUpdates(frame(chatty), maxEvents = 8).collect()
    assert(got.length == 1)
    assert(got.head.saturated)
    assert(got.head.stage >= 1L) // still emits a well-formed snapshot
  }
}
