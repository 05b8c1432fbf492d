package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming perceptual-hash NEAR-duplicate detection for images —
  * the continuous counterpart of the batch `mm_neardup` hamming-LSH
  * join, completing the modality symmetry: text has
  * [[StreamNearDup]] (MinHash), embeddings have [[StreamAnnDedup]]
  * (sign-LSH cosine), images get dHash band buckets with exact
  * XOR-popcount verification in keyed state.
  *
  * Shape: each image arrives as its 64-bit dHash pre-sliced into four
  * 16-bit bands (the decode stage runs upstream at ingest — the
  * stream is the DEDUP state path) and is routed to one keyed-state
  * bucket per band (key = band·2^16 + value, the same fan-out as the
  * batch band join). A bucket keeps a bounded list of representative
  * hashes; an arriving image is compared against them and emits a
  * pair per representative within `maxHamming` of its full 64-bit
  * hash. Hamming over four ints is the identical integer computation
  * the batch join's codegen'd `bit_count(a ^ b)` performs, so stream
  * and batch agree bit-for-bit — no rounding contract needed (the
  * cosine paths' one subtlety doesn't exist in hamming space).
  *
  * State layout: packed primitive arrays (the [[StreamNearDup]]
  * lesson) — a bucket's reps are an id array plus a flat int array
  * (rep r's four bands at [4r, 4r+4)).
  *
  * Scale/state design: state is per band bucket — a keyed aggregation
  * any cluster spreads like a shuffle; buckets cap at `maxReps` reps
  * and expire `delay` after their newest image (event-time timeout),
  * bounding state at O(active buckets · maxReps), not O(history).
  * `addMatchedReps = true` is the audit/backfill mode whose emitted
  * pairs are exactly the batch band-bucket relation — the mode the
  * DuckDB-graded `stream_incremental_mmdedup` query runs. */
object StreamMmDedup {

  case class BandHash(bkey: Long, media_id: Long, ts: Timestamp,
      h0: Int, h1: Int, h2: Int, h3: Int)
  case class BucketState(ids: Array[Long], hs: Array[Int])
  case class Candidate(a_id: Long, b_id: Long, bkey: Long, hamming: Int)

  /** Candidate near-dup pairs from a stream of dHashed images.
    *
    * @param stream frame with idCol, tsCol and the four 16-bit band
    *               columns (b0..b3) of each image's dHash
    * @param maxHamming exact-verify threshold (≤ 3 guarantees the
    *               banding is lossless — see Multimodal.dhashBands)
    * @param addMatchedReps audit mode: every image becomes a rep, so
    *               the emitted pairs (distinct over buckets) are
    *               exactly the batch mm_neardup relation. Production
    *               drops matched images as reps and caps hot buckets. */
  def candidatePairs(stream: DataFrame, idCol: String,
      bandCols: Seq[String] = Seq("b0", "b1", "b2", "b3"),
      tsCol: String = "ts", delay: String = "1 hour",
      maxHamming: Int = 3, maxReps: Int = 64,
      addMatchedReps: Boolean = false)(
      implicit spark: SparkSession): Dataset[Candidate] = {
    import spark.implicits._
    require(bandCols.length == 4, s"need 4 band columns, got $bandCols")
    val isStreaming = stream.isStreaming

    val banded = stream
      .select(col(idCol).cast("long").as("media_id"), col(tsCol).as("ts"),
        col(bandCols(0)).cast("int").as("h0"), col(bandCols(1)).cast("int").as("h1"),
        col(bandCols(2)).cast("int").as("h2"), col(bandCols(3)).cast("int").as("h3"))
      .select(col("media_id"), col("ts"),
        col("h0"), col("h1"), col("h2"), col("h3"),
        posexplode(array(col("h0"), col("h1"), col("h2"), col("h3")))
          .as(Seq("band", "bval")))
      .withColumn("bkey", col("band").cast("long") * 65536L + col("bval"))
      .select("bkey", "media_id", "ts", "h0", "h1", "h2", "h3")
      .withWatermark("ts", delay)
      .as[BandHash]

    banded.groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, imgs: Iterator[BandHash], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(
              BucketState(Array.emptyLongArray, Array.emptyIntArray))
            var nReps = prior.ids.length
            var ids = java.util.Arrays.copyOf(prior.ids, math.max(4, nReps))
            var hs = java.util.Arrays.copyOf(prior.hs, math.max(16, nReps * 4))
            val out = List.newBuilder[Candidate]
            var maxTs = Long.MinValue
            // deterministic in-batch order regardless of shuffle arrival
            imgs.toSeq.sortBy(x => (x.ts.getTime, x.media_id)).foreach { x =>
              maxTs = math.max(maxTs, x.ts.getTime)
              var matched = false
              var r = 0
              while (r < nReps) {
                if (ids(r) != x.media_id) {
                  val o = r * 4
                  val ham = Integer.bitCount(hs(o) ^ x.h0) +
                    Integer.bitCount(hs(o + 1) ^ x.h1) +
                    Integer.bitCount(hs(o + 2) ^ x.h2) +
                    Integer.bitCount(hs(o + 3) ^ x.h3)
                  if (ham <= maxHamming) {
                    matched = true
                    out += Candidate(math.min(ids(r), x.media_id),
                      math.max(ids(r), x.media_id), key, ham)
                  }
                }
                r += 1
              }
              if ((addMatchedReps || !matched) && nReps < maxReps) {
                if (nReps == ids.length) {
                  ids = java.util.Arrays.copyOf(ids, ids.length * 2)
                  hs = java.util.Arrays.copyOf(hs, hs.length * 2)
                }
                ids(nReps) = x.media_id
                hs(nReps * 4) = x.h0; hs(nReps * 4 + 1) = x.h1
                hs(nReps * 4 + 2) = x.h2; hs(nReps * 4 + 3) = x.h3
                nReps += 1
              }
            }
            state.update(BucketState(
              java.util.Arrays.copyOf(ids, nReps),
              java.util.Arrays.copyOf(hs, nReps * 4)))
            if (isStreaming && maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs, delay)
            out.result().iterator
          }
      }
  }
}
