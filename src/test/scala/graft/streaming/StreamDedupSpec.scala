package graft.streaming

import graft.dedup.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("streaming exact dedup drops in-watermark duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = StreamDedup.exactDedup(df, "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(m: Int) = Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")
    mem.addData((t0, "alpha"), (at(1), "beta"), (at(2), "alpha"),
      (at(3), "gamma"), (at(4), "beta"), (at(5), "alpha"))
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("dedup_out").select("text").collect().map(_.getString(0)).sorted
    assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
  }
}
