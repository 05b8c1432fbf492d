package graft.streaming

import graft.dedup.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def at(m: Int) = Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")

  private val base = "the quick brown fox jumps over the lazy dog again and again"

  test("streaming near-dup emits candidate pairs for similar docs only") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamNearDup.candidatePairs(df, "doc_id", "text", minEst = 0.5)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    mem.addData(
      (1L, at(0), base),
      (2L, at(1), base + " tail"), // near-dup of 1 (shares most shingles)
      (3L, at(2), "completely different words about spark streaming state management here"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_out")
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("exact duplicate matches every band; estimate is 1.0") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamNearDup.candidatePairs(df, "doc_id", "text", minEst = 0.9)
      .writeStream.format("memory").queryName("neardup_exact")
      .outputMode("append").start()
    mem.addData((10L, at(0), base))
    q.processAllAvailable()
    mem.addData((11L, at(1), base)) // identical text in a later batch
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("neardup_exact")
      .select("a_id", "b_id", "est_jaccard").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => (r.getLong(0), r.getLong(1)) == (10L, 11L)))
    assert(rows.forall(_.getDouble(2) == 1.0))
    // one row per matching band, at most `bands` of them
    assert(rows.length <= 4)
  }

  test("short docs (no shingles) pass through without pairs or errors") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamNearDup.candidatePairs(df, "doc_id", "text")
      .writeStream.format("memory").queryName("neardup_short")
      .outputMode("append").start()
    mem.addData((20L, at(0), "too short"), (21L, at(1), "too short"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("neardup_short").count() == 0)
  }

  test("batch mode runs the same state function (backfill path)") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq(
      (1L, at(0), base),
      (2L, at(1), base + " tail"),
      (3L, at(2), "completely different words about spark streaming state management here"))
      .toDF("doc_id", "ts", "text")
    val pairs = StreamNearDup.candidatePairs(df, "doc_id", "text", minEst = 0.5)
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
