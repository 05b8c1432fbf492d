package graft.streaming

import graft.dedup.SparkTest
import graft.ext.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-ANN RE-INDEX path (VERDICT r16 item 6): a fixed
  * sign-LSH geometry is the right call for state-key stability, but a
  * growing corpus eventually makes its buckets hot — the batch side
  * grew a volume-derived plane governor for exactly that reason
  * (`ann_lsh_pairs_fixed` degrades 14× at 10× data). This spec pins
  * the OFFLINE MIGRATION that moves a live deployment to a new plane
  * count without losing its dedup memory:
  *
  *   1. DRAIN — read the old checkpoint's keyed state through Spark's
  *      state data source (public API, no checkpoint surgery) and
  *      recover the rep vector ids ([[StreamAnnDedup.drainStateIds]]).
  *   2. RE-KEY — join the drained ids to the embeddings table (always
  *      present in the lakehouse; re-normalizing the in-state unit
  *      vectors instead would double-round and break bit-parity with
  *      the batch relation) and replay them as the FIRST batch of a
  *      fresh checkpoint keyed under the new plane set.
  *   3. RESUME — live ingestion continues on the new checkpoint; the
  *      replayed reps score arriving vectors exactly as if the
  *      deployment had always run the new geometry.
  *
  * The acceptance bar: post-migration pairs (replay + resumed run,
  * audit mode) equal the batch [[Ann.lshPairs]] relation under the new
  * geometry over the full corpus — bit-identical ids, buckets AND
  * 6-dp cosines. Re-emission caveat: the replay batch re-emits pairs
  * already found under the old geometry (downstream sinks dedup on
  * (a_id, b_id) — the same idempotence they already need for
  * at-least-once delivery). */
class StreamAnnReindexSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private val Dim = 8
  // 24 vectors in 3 direction families (near-dups within a family:
  // base direction + small deterministic perturbation), ids
  // interleaved across families so both phases see all families
  private def vectors: Seq[(Long, Array[Float])] = (0L until 24L).map { id =>
    val fam = (id % 3).toInt
    val v = Array.tabulate(Dim) { d =>
      val base = if (d % 3 == fam) 1.0f else 0.1f * ((d + fam) % 5)
      base + 0.015f * (((id * 7 + d * 3) % 11).toInt - 5)
    }
    (id, v)
  }

  private def embDf(s: SparkSession): DataFrame = {
    import s.implicits._
    vectors.toDF("vec_id", "embedding")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
  }

  test("drain -> re-key under more planes -> resume: post-migration pairs equal the batch relation") {
    val s = spark.newSession()
    implicit val sp: SparkSession = s
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val all = embDf(s)
    val oldPlanes = Ann.hyperplanes(3, Dim) // the original fixed geometry
    val newPlanes = Ann.hyperplanes(5, Dim) // governed: corpus grew, buckets hot
    val minCos = 0.20
    val tmp = java.nio.file.Files.createTempDirectory("graft_reindex")
    try {
      val (in1, ck1) = (s"$tmp/in1", s"$tmp/ck1")
      val (in2, ck2, out2) = (s"$tmp/in2", s"$tmp/ck2", s"$tmp/out2")
      def runOnce(batch: DataFrame, in: String, ck: String, out: Option[String],
          planes: Seq[Seq[Double]]): Unit = {
        batch.coalesce(1).write.mode("append").parquet(in)
        val stream = s.readStream.schema(batch.schema).parquet(in)
        val pairs = StreamAnnDedup.candidatePairs(stream, "vec_id", "embedding",
          planes = planes, tsCol = "ts", delay = "1 hour",
          minCos = minCos, maxReps = Int.MaxValue, addMatchedReps = true)
        val q = pairs.toDF().writeStream
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) =>
            // the batch must execute even when its pairs are discarded
            // (phase 1): an unconsumed foreachBatch runs no jobs, so
            // no state store ever commits
            out.fold(b.count(): Unit)(o => b.write.mode("append").parquet(o))
          }
          .start()
        q.awaitTermination()
      }
      // ---- phase 1: the live deployment on the OLD geometry
      runOnce(all.filter(col("vec_id") < 12), in1, ck1, None, oldPlanes)

      // ---- migration: drain state ids, re-key via the embeddings table
      val drained = StreamAnnDedup.drainStateIds(s, ck1)
      val drainedIds = drained.collect().map(_.getLong(0)).sorted
      assert(drainedIds.toSeq == (0L until 12L), drainedIds.toSeq.toString)
      val seed = all.join(drained, Seq("vec_id"), "left_semi")

      // ---- phase 2: replay the drained reps into a FRESH checkpoint
      // under the new planes, then resume live ingestion (a real
      // checkpoint RESUME: second AvailableNow run on the same ck2)
      runOnce(seed, in2, ck2, Some(out2), newPlanes)
      runOnce(all.filter(col("vec_id") >= 12), in2, ck2, Some(out2), newPlanes)

      val streamed = s.read.parquet(out2)
        .select("a_id", "b_id", "bucket", "cos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = Ann.lshPairs(Ann.prepared(all.select("vec_id", "embedding")),
        newPlanes, minCos)
        .select("a_id", "b_id", "bucket", "cos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(batch.nonEmpty, "degenerate fixture: batch relation is empty")
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
      // and the migration actually changed the keying: the old
      // geometry's bucket ids are 3-bit, the new ones use 5 bits
      assert(batch.exists(_._3 >= 8), "new geometry never produced a >3-bit bucket")
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(tmp.toFile)
    }
  }
}
