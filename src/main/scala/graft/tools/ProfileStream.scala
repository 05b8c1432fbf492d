package graft.tools

import graft.core.Tables
import graft.streaming.StreamNearDup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev probe: phase-level timing of the stream_incremental_neardup
  * harness — isolates where the wall time goes (input write, each
  * AvailableNow run, readout) so streaming optimization targets the
  * real cost instead of the state function by assumption.
  * Usage: runMain graft.tools.ProfileStream <sfDir>
  */
object ProfileStream {
  // mirror of TextQueries' private LSH parameters
  private val NumSigs = 12
  private val Bands = 6
  private val ShingleK = 2
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val localDir = LocalDirs.ramLocalDir("profstream")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // mirror of the gated query's md5-bucketed 25% sample (r13)
    val docs = Tables.documents(spark, sfDir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("0", "1", "2", "3"))
      .select(col("doc_id"), col("text"))
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", cpus)
    ss.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")

    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_profstream")
    val in = s"$tmp/in"
    val ck = s"$tmp/ck"
    val out = s"$tmp/out"
    def runOnce(label: String, batch: DataFrame): Unit = {
      time(s"$label/write-input") {
        batch.repartition(32).write.mode("append").parquet(in)
      }
      time(s"$label/stream-run") {
        val stream = ss.readStream.schema(docs.schema).parquet(in)
        val pairs = StreamNearDup.candidatePairs(stream, "doc_id", "text",
          tsCol = "ts", delay = "1 hour",
          numSigs = NumSigs, bands = Bands,
          shingleK = ShingleK, minEst = 0.5,
          maxReps = Int.MaxValue, addMatchedReps = true)(ss)
        val q = pairs.toDF().writeStream
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        q.awaitTermination()
        q.recentProgress.foreach { p =>
          val so = p.stateOperators.headOption
          println(s"  [batch ${p.batchId}] rows=${p.numInputRows} " +
            s"durations=${p.durationMs} " +
            so.fold("")(o => s"stateRows=${o.numRowsTotal} updated=${o.numRowsUpdated} " +
              s"commitMs=${o.commitTimeMs} customMetrics=${o.customMetrics}"))
        }
      }
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      Seq(in, ck, out).foreach { p =>
        val f = new java.io.File(p)
        def rm(x: java.io.File): Unit = {
          val kids = x.listFiles(); if (kids != null) kids.foreach(rm)
          x.delete(): Unit
        }
        rm(f)
      }
      // phase 0: the column side alone (sigs+banding, no state op)
      time("columns-only") {
        val base = docs
          .withColumn("_w", graft.ext.TextOps.words(col("text")))
          .withColumn("_sh", graft.ext.TextOps.shingles(col("_w"), ShingleK))
          .filter(size(col("_sh")) > 0)
          .withColumn("_digests",
            graft.ext.TextOps.minhashDigests(col("_sh"), NumSigs))
        val withSigs = (0 until NumSigs).foldLeft(base) { (df, i) =>
          df.withColumn(s"_sig_$i",
            graft.ext.TextOps.minhashSigFromDigests(col("_digests"), i))
        }
        withSigs.select((0 until NumSigs)
          .map(i => col(s"_sig_$i")): _*).write.format("noop")
          .mode("overwrite").save()
      }
      runOnce("run1", docs.filter(col("doc_id") <= mid))
      runOnce("run2", docs.filter(col("doc_id") > mid))
      time("readout") {
        spark.read.parquet(out).dropDuplicates("a_id", "b_id").count(): Unit
      }
    }
    def rm(x: java.io.File): Unit = {
      val kids = x.listFiles(); if (kids != null) kids.foreach(rm)
      x.delete(): Unit
    }
    rm(tmp.toFile)
    spark.stop()
  }
}
