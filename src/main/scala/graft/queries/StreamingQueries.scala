package graft.queries

import graft.core.Tables
import graft.streaming.StreamDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming operators under the DuckDB correctness gate (VERDICT r9
  * item 4): where a streaming path's FINAL STATE is expressible as a
  * batch query, it is declared here and graded like every batch
  * operator — closing the "streaming siblings are spec-only" gap.
  *
  * The other streaming ops (watermarked near-dup state, funnels, the
  * anomaly monitor) have no batch-equal final state by nature
  * (watermark drops are arrival-order-dependent); they stay under
  * their batch-parity specs in graft/streaming. */
object StreamingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-RUN incremental exact dedup, END-TO-END through the real
    // streaming machinery: the documents table is split into two
    // id-ordered halves ("yesterday's ingest", "today's"), each
    // shipped through StreamDedup.incrementalDedup as its own
    // Trigger.AvailableNow run over a file source with a shared
    // checkpoint + persistent hash index — run 2 resumes the
    // checkpoint, reads only the new files, and dedups against the
    // on-disk index of everything run 1 shipped. With the
    // deterministic min-id in-batch survivor and the id-ordered
    // split, the union of both runs' survivors must equal the BATCH
    // exact-dedup answer (min doc_id per content hash) — which is
    // exactly what the DuckDB twin grades. Scale: the per-batch
    // anti-join shuffles by hash like any equi-join and the index is
    // a parquet table — O(distinct history) on disk, not in executor
    // memory.
    "stream_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dedup")
      val in = s"$tmp/in"
      val idx = s"$tmp/idx"
      val ck = s"$tmp/ck"
      val out = s"$tmp/out"
      def runOnce(batch: DataFrame): Unit = {
        // one file per run → one micro-batch per run, so the in-batch
        // min-id survivor is the run-wide min-id survivor
        batch.coalesce(1).write.mode("append").parquet(in)
        val stream = s.readStream.schema(docs.schema).parquet(in)
        StreamDedup.incrementalDedup(stream, "text", idx, ck, idCol = Some("doc_id")) {
          (fresh, _) => fresh.write.mode("append").parquet(out)
        }.awaitTermination()
      }
      runOnce(docs.filter(col("doc_id") <= mid))
      runOnce(docs.filter(col("doc_id") > mid))
      val result = s.read.parquet(out)
        .select(col("doc_id"), md5(col("text").cast("string")).as("content_hash"))
        .orderBy("doc_id")
        .localCheckpoint(true) // materialize before the tmp dir is deleted
      // best-effort cleanup of the run's scratch tree
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(tmp.toFile)
      result
    })
  )

  val oracle: Map[String, String] = Map(
    // the batch twin of the two-run incremental state: first-seen
    // (lowest doc_id) survivor per exact content hash
    "stream_incremental_dedup" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS content_hash
        |FROM documents GROUP BY md5(text)
        |ORDER BY doc_id""".stripMargin
  )
}
