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

  test("band-collision flood: hot bucket stays at one rep, output stays stable") {
    // 45 byte-identical docs collide in EVERY band — the hottest
    // bucket possible. Containment: doc 1 becomes the bucket's only
    // representative; every later doc MATCHES it and therefore never
    // becomes a rep itself, so state stays at 1 rep per bucket while
    // the flood streams through. Observable consequence: every pair
    // names doc 1 as a_id — if state grew with the flood, later docs
    // would pair with earlier flood members too.
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamNearDup.candidatePairs(df, "doc_id", "text", minEst = 0.9)
      .writeStream.format("memory").queryName("neardup_flood")
      .outputMode("append").start()
    mem.addData((1L to 40L).map(i => (i, at(i.toInt % 50), base)))
    q.processAllAvailable()
    mem.addData((41L to 45L).map(i => (i, at(45), base))) // flood continues next batch
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("neardup_flood")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall(_._1 == 1L),
      s"state grew under flood: pairs not anchored at doc 1: ${rows.filter(_._1 != 1L).take(5).toSeq}")
    assert(rows.map(_._2).toSet == (2L to 45L).toSet)
    // one row per matching band, so ≤ bands (4) per pair — bounded
    // output volume, not O(flood²)
    assert(rows.length <= 44 * 4)
    // the documented downstream composition: pair-level uniqueness
    // via dropDuplicates over the band-level candidate stream
    val uniq = spark.table("neardup_flood").dropDuplicates("a_id", "b_id").count()
    assert(uniq == 44L)
  }

  test("maxReps cap: matched docs never become reps even at cap 1") {
    // cap of 1: the bucket can never hold more than its first rep.
    // B (a near-dup of A) matches A -> pairs, is NOT added; C is
    // byte-identical to A so it shares exactly A's band keys — if B
    // had leaked into any shared bucket as a rep, C would emit a
    // (2,3) pair. Bounded state means C pairs with A alone.
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamNearDup.candidatePairs(df, "doc_id", "text",
      minEst = 0.5, maxReps = 1)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append").start()
    mem.addData((1L, at(0), base))
    q.processAllAvailable()
    mem.addData((2L, at(1), base + " tail"))
    q.processAllAvailable()
    mem.addData((3L, at(2), base))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_cap")
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L)), s"got $pairs")
  }

  test("event-time timeout reclaims bucket state after the watermark passes") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val other = "entirely different vocabulary concerning distributed snapshot algorithms and consensus"
    val q = StreamNearDup.candidatePairs(df, "doc_id", "text",
      delay = "10 minutes", minEst = 0.9)
      .writeStream.format("memory").queryName("neardup_timeout")
      .outputMode("append").start()
    // b1: seed the bucket; b2: a near-dup pairs with it (state alive)
    mem.addData((1L, at(0), base))
    q.processAllAvailable()
    mem.addData((2L, at(5), base))
    q.processAllAvailable()
    // b3/b4: unrelated docs push the watermark far past the bucket's
    // timeout (last seen 10:05 + 10 min); the timed-out bucket is
    // reclaimed on the b4 trigger
    mem.addData((50L, Timestamp.valueOf("2024-01-01 11:00:00"), other))
    q.processAllAvailable()
    mem.addData((51L, Timestamp.valueOf("2024-01-01 11:01:00"), other + " more"))
    q.processAllAvailable()
    // b5: the same text again, AFTER reclaim: it must re-seed an
    // empty bucket, so it emits no pair with the expired doc 1
    mem.addData((3L, Timestamp.valueOf("2024-01-01 11:30:00"), base))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_timeout")
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"pre-timeout pair missing: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"doc 3 paired with reclaimed state: $pairs")
  }

  test("audit mode (addMatchedReps) emits ALL same-bucket pairs, any arrival order") {
    // 3 byte-identical docs + 1 near-dup: production mode anchors
    // every pair at the bucket's single rep (doc 1); audit mode must
    // emit the full clique — including the (2,3) pair production
    // mode suppresses — because the graded stream_incremental_neardup
    // query's DuckDB twin is the relational self-join.
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamNearDup.candidatePairs(df, "doc_id", "text",
      minEst = 0.5, maxReps = Int.MaxValue, addMatchedReps = true)
      .writeStream.format("memory").queryName("neardup_audit")
      .outputMode("append").start()
    mem.addData((1L, at(0), base), (2L, at(1), base))
    q.processAllAvailable()
    mem.addData((3L, at(2), base), (4L, at(3), base + " tail"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_audit")
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)),
      s"audit mode must emit the full clique, got $pairs")
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
