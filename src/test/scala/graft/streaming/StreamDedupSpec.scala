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

  test("incremental dedup persists across independent runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("incdedup")
    base.toFile.deleteOnExit()
    val index = s"$base/index"
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def runOnce(ckpt: String, rows: (Timestamp, String)*): Unit = {
      val mem = MemoryStream[(Timestamp, String)]
      mem.addData(rows: _*)
      val q = StreamDedup.incrementalDedup(
        mem.toDF().toDF("ts", "text"), "text", index, s"$base/$ckpt") {
        (fresh, _) => out ++= fresh.select("text").collect().map(_.getString(0))
      }
      q.awaitTermination() // AvailableNow stops after draining
    }
    runOnce("ck1", (at(0), "alpha"), (at(1), "alpha"), (at(2), "beta"))
    assert(out.sorted.toSeq == Seq("alpha", "beta"))
    // a brand-new query (fresh checkpoint = a restart or next daily
    // run) still drops everything the FIRST run shipped
    runOnce("ck2", (at(3), "alpha"), (at(4), "beta"), (at(5), "gamma"))
    assert(out.sorted.toSeq == Seq("alpha", "beta", "gamma"))
  }

  private def at(m: Int) = Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")
}
