package graft.streaming

import graft.ext.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming MinHash-LSH NEAR-duplicate detection — the continuous
  * counterpart of the batch `text_lsh_pairs` banded join.
  *
  * Shape: each document's MinHash signature is split into LSH bands;
  * the doc is routed to one keyed-state bucket per band (same
  * `explode` fan-out as the batch band join, so a bucket holds only
  * docs agreeing on a whole band — candidates, not the corpus). Each
  * bucket keeps a bounded list of representative signatures; an
  * arriving doc is compared against them and emits a candidate pair
  * per representative whose signature-agreement fraction (the
  * standard unbiased Jaccard estimate) clears `minEst`.
  *
  * State layout — PACKED PRIMITIVE ARRAYS, not an object graph: a
  * bucket's representatives are stored as a doc-id array plus one
  * flattened signature array (rep r's sigs at [r·numSigs,
  * (r+1)·numSigs)). Keyed state pays an encoder round-trip on every
  * read and write, and Catalyst's (de)serializer for nested
  * collections of case classes walks the graph element by element —
  * at corpus-sized state (audit mode retains every doc) that walk IS
  * the bottleneck, while primitive `Array[Long]` columns copy as
  * single memory blocks. Signatures travel as longs (the 8-hex sig →
  * unsigned-32-bit parse is injective, so agreement counts and
  * therefore est_jaccard are bit-identical to the hex-string form).
  *
  * Scale/state design: state is per (band, band-hash) bucket — the
  * natural shard key, so a 1000-executor cluster spreads buckets like
  * any keyed aggregation. Each bucket is capped at `maxReps`
  * representatives (hot buckets saturate instead of growing without
  * bound) and expires `delay` after the newest doc it has seen
  * (event-time timeout against the watermark), which keeps total
  * state O(active buckets), not O(history) — the same bound
  * [[StreamDedup.exactDedup]] gets from
  * `dropDuplicatesWithinWatermark`.
  *
  * Contract: the output is the candidate-pair stream (one row per
  * matching band, so a pair agreeing on several bands appears up to
  * `bands` times — downstream `dropDuplicates` on (a_id, b_id) if
  * pair-level uniqueness matters). Exact-Jaccard verification needs
  * the shingle sets, which streaming state deliberately does not
  * retain; the estimate's resolution is 1/`numSigs`. */
object StreamNearDup {

  case class BandedDoc(band_key: String, doc_id: Long, ts: Timestamp, sigs: Array[Long])
  /** Bucket reps as packed primitives: `sigs` holds `doc_ids.length`
    * consecutive `nSigs`-long signature blocks. */
  case class BucketState(doc_ids: Array[Long], sigs: Array[Long])
  case class Candidate(a_id: Long, b_id: Long, band_key: String, est_jaccard: Double)

  /** Candidate near-dup pairs from a stream of documents.
    *
    * @param stream  streaming (or batch, for tests) DataFrame
    * @param idCol   long-castable document id column
    * @param textCol text column; docs with fewer than `shingleK`
    *                words produce no shingles and are passed through
    *                silently (they can never near-dup by Jaccard)
    * @param tsCol   event-time column (watermark source)
    * @param delay   watermark delay = how long a bucket waits for
    *                late near-dups before its state is reclaimed
    * @param minEst  minimum signature-agreement fraction to emit
    * @param addMatchedReps audit/backfill mode: EVERY doc becomes a
    *                bucket representative, matched or not, so the
    *                emitted pairs are exactly "all same-bucket pairs
    *                with agreement ≥ minEst" — the relationally
    *                expressible semantics the DuckDB-graded
    *                `stream_incremental_neardup` query needs. State
    *                grows O(bucket) instead of O(distinct reps);
    *                keep the default (false) in production, where
    *                rep suppression + `maxReps` bound hot buckets. */
  def candidatePairs(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String = "ts", delay: String = "1 hour",
      numSigs: Int = 12, bands: Int = 4, shingleK: Int = 3,
      minEst: Double = 0.5, maxReps: Int = 64,
      addMatchedReps: Boolean = false)(
      implicit spark: SparkSession): Dataset[Candidate] = {
    require(numSigs % bands == 0, s"numSigs=$numSigs not divisible by bands=$bands")
    import spark.implicits._
    val rowsPerBand = numSigs / bands
    val isStreaming = stream.isStreaming

    val base = stream
      .withColumn("_w", TextOps.words(col(textCol)))
      .withColumn("_sh", TextOps.shingles(col("_w"), shingleK))
      .filter(size(col("_sh")) > 0)
      .withColumn("_digests", TextOps.minhashDigests(col("_sh"), numSigs))
    val withSigCols = (0 until numSigs).foldLeft(base) { (df, i) =>
      df.withColumn(s"_sig_$i", TextOps.minhashSigFromDigests(col("_digests"), i))
    }
    val bandKeys = array((0 until bands).map { b =>
      TextOps.bandKey(b,
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"_sig_$i")))
    }: _*)
    val banded = withSigCols
      .withColumn("band_key", explode(bandKeys))
      .select(col("band_key"), col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"),
        array((0 until numSigs).map(i =>
          conv(col(s"_sig_$i"), 16, 10).cast("long")): _*).as("sigs"))
      .withWatermark("ts", delay)
      .as[BandedDoc]

    banded.groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, docs: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(
              BucketState(Array.emptyLongArray, Array.emptyLongArray))
            // grow-in-place scan buffers (capacity doubling): appends
            // are amortized O(1) and the live prefix is scanned
            // directly — no per-append copying in hot buckets
            var nReps = prior.doc_ids.length
            var ids = java.util.Arrays.copyOf(prior.doc_ids, math.max(4, nReps))
            var sigsFlat = java.util.Arrays.copyOf(prior.sigs, math.max(4 * numSigs, nReps * numSigs))
            val out = List.newBuilder[Candidate]
            var maxTs = Long.MinValue
            // deterministic in-batch order regardless of shuffle arrival
            docs.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              maxTs = math.max(maxTs, d.ts.getTime)
              var matched = false
              var r = 0
              while (r < nReps) {
                if (ids(r) != d.doc_id) {
                  var agree = 0
                  var i = 0
                  val off = r * numSigs
                  while (i < numSigs) {
                    if (sigsFlat(off + i) == d.sigs(i)) agree += 1
                    i += 1
                  }
                  val est = agree.toDouble / numSigs
                  if (est >= minEst) {
                    matched = true
                    out += Candidate(math.min(ids(r), d.doc_id),
                      math.max(ids(r), d.doc_id), key,
                      math.rint(est * 1e6) / 1e6)
                  }
                }
                r += 1
              }
              // near-dups of an existing rep add no recall as reps
              // themselves; distinct docs become reps up to the cap
              // (audit mode admits matched docs too — see scaladoc)
              if ((addMatchedReps || !matched) && nReps < maxReps) {
                if (nReps == ids.length) {
                  ids = java.util.Arrays.copyOf(ids, ids.length * 2)
                  sigsFlat = java.util.Arrays.copyOf(sigsFlat, sigsFlat.length * 2)
                }
                ids(nReps) = d.doc_id
                System.arraycopy(d.sigs, 0, sigsFlat, nReps * numSigs, numSigs)
                nReps += 1
              }
            }
            state.update(BucketState(
              java.util.Arrays.copyOf(ids, nReps),
              java.util.Arrays.copyOf(sigsFlat, nReps * numSigs)))
            // batch runs (tests, backfills) have no watermark to time
            // out against — timeouts are a streaming-only concern
            if (isStreaming && maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs, delay)
            out.result().iterator
          }
      }
  }
}
