package graft.streaming

import graft.dedup.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The streaming dHash band-bucket state ([[StreamMmDedup]]):
  * near-hash images pair, far ones don't, audit mode reproduces the
  * batch band relation, maxReps bounds hot buckets. Hashes are
  * hand-picked band values so every expectation is arithmetic. */
class StreamMmDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def at(m: Int) = Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")

  // base hash; a 2-bit-away variant (band 0 differs by 2 bits, other
  // bands equal → candidates via bands 1-3, hamming 2); a far hash
  // that still SHARES band 3 (a candidate that must fail the verify
  // with hamming 16+16+16 = 48)
  private val base = (0x1234, 0x00FF, 0xAAAA, 0x5555)
  private val near = (0x1234 ^ 0x0011, 0x00FF, 0xAAAA, 0x5555)
  private val farSharing = (0x1234 ^ 0xFFFF, 0x00FF ^ 0xFFFF, 0xAAAA ^ 0xFFFF, 0x5555)

  private type Img = (Long, Timestamp, Int, Int, Int, Int)
  private def row(id: Long, m: Int, h: (Int, Int, Int, Int)): Img =
    (id, at(m), h._1, h._2, h._3, h._4)

  private def run(batches: Seq[Seq[Img]], maxReps: Int = 64,
      audit: Boolean = false): Set[(Long, Long, Int)] = {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Img]
    val df = mem.toDF().toDF("media_id", "ts", "b0", "b1", "b2", "b3")
    val name = s"mm_sd_out_${System.nanoTime()}"
    val q = StreamMmDedup.candidatePairs(df, "media_id",
      maxReps = maxReps, addMatchedReps = audit)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select("a_id", "b_id", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("near hashes pair with exact hamming; far-but-band-sharing ones are verified out") {
    val got = run(Seq(
      Seq(row(1L, 0, base)),
      Seq(row(2L, 1, near), row(3L, 2, farSharing))))
    assert(got == Set((1L, 2L, 2)), got.toString)
  }

  test("audit mode equals the batch band-bucket relation across a restart-shaped split") {
    // all three share band 3 → candidates; only (1,2) passes hamming≤3.
    // Feed in two batches (the cross-batch pair must come from STATE).
    val got = run(Seq(
      Seq(row(1L, 0, base), row(3L, 1, farSharing)),
      Seq(row(2L, 2, near))), audit = true)
    assert(got == Set((1L, 2L, 2)), got.toString)
    // batch execution of the same state function agrees
    import spark.implicits._
    implicit val s = spark
    val batch = StreamMmDedup.candidatePairs(
      Seq(row(1L, 0, base), row(3L, 1, farSharing), row(2L, 2, near))
        .toDF("media_id", "ts", "b0", "b1", "b2", "b3"),
      "media_id", maxReps = Int.MaxValue, addMatchedReps = true)
      .select("a_id", "b_id", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batch == got)
  }

  test("maxReps bounds a hot bucket: the cap'th+1 image stops becoming a rep") {
    // 3 identical hashes, maxReps = 1: image 1 is the only rep; 2 and
    // 3 each pair against it (then are dropped as reps), so (2,3)
    // never emits
    val got = run(Seq(Seq(row(1L, 0, base)),
      Seq(row(2L, 1, base)), Seq(row(3L, 2, base))),
      maxReps = 1, audit = true)
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0)), got.toString)
  }

  test("deterministic in-batch order: same-batch arrivals pair regardless of insertion order") {
    val a = run(Seq(Seq(row(1L, 0, base), row(2L, 1, near))))
    val b = run(Seq(Seq(row(2L, 1, near), row(1L, 0, base))))
    assert(a == b && a == Set((1L, 2L, 2)), s"$a vs $b")
  }
}
