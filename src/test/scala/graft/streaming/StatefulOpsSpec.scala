package graft.streaming

import graft.dedup.SparkTest
import graft.streaming.StatefulOps.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")

  test("milestone state survives across micro-batches, emits each crossing once") {
    import spark.implicits._
    implicit val sp = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = StatefulOps.milestones(mem.toDS(), step = 10.0)
      .writeStream.format("memory").queryName("milestones_out")
      .outputMode("append").start()

    // batch 1: user 1 reaches 8 (no milestone), user 2 jumps to 25
    mem.addData(UserEvent(1L, ts(0), 8.0), UserEvent(2L, ts(1), 25.0))
    q.processAllAvailable()
    // batch 2: user 1 crosses 10 with +4; user 2 crosses 30 with +6
    mem.addData(UserEvent(1L, ts(2), 4.0), UserEvent(2L, ts(3), 6.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("milestones_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // user 2 batch 1 crossed milestones 1 and 2 (total 25)
    assert(got == Seq((1L, 1L), (2L, 1L), (2L, 2L), (2L, 3L)))
  }

  test("same operator runs in batch mode") {
    import spark.implicits._
    implicit val sp = spark
    val ds = Seq(UserEvent(7L, ts(0), 15.0), UserEvent(7L, ts(1), 10.0)).toDS()
    val got = StatefulOps.milestones(ds, 10.0).collect()
      .map(m => (m.milestone, m.total)).sorted.toSeq
    assert(got == Seq((1L, 15.0), (2L, 25.0)))
  }
}
