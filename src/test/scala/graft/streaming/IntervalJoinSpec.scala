package graft.streaming

import graft.dedup.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The streaming interval join produces the same pairs as the batch
  * bucketed RangeJoin over the same rows — one semantics, two
  * execution regimes. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val clicks = Seq((100L, 1L, ts(30)), (101L, 1L, ts(50)), (102L, 2L, ts(40)))
  private val views = Seq(
    (1L, ts(10), 1.0), (1L, ts(25), 2.0), (1L, ts(45), 3.0),
    (2L, ts(39), 4.0), (2L, ts(41), 5.0))

  test("stream-stream interval join equals batch RangeJoin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val lMem = MemoryStream[(Long, Long, Timestamp)]
    val rMem = MemoryStream[(Long, Timestamp, Double)]
    val lDf = lMem.toDF().toDF("event_id", "user_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val rDf = rMem.toDF().toDF("user_id", "view_ts", "view_value")
      .withWatermark("view_ts", "10 minutes")

    val q = EventStreams.intervalJoin(lDf, rDf, "user_id",
      "click_ts", "view_ts", lowerSec = 1200L)
      .select("event_id", "view_ts")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    lMem.addData(clicks: _*)
    rMem.addData(views: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ij_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet

    val want = graft.ext.RangeJoin.rangeJoin(
      clicks.toDF("event_id", "user_id", "click_ts"),
      views.toDF("user_id", "view_ts", "view_value"),
      Seq("user_id"), "click_ts", "view_ts", 1200L, 0L)
      .select("event_id", "view_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet

    assert(want.nonEmpty && got == want)
    // spot-check the semantics: click 100 (10:30, user 1) sees views
    // at 10:10 and 10:25 but not 10:45
    assert(want.filter(_._1 == 100L).map(_._2) == Set(ts(10), ts(25)))
  }
}
