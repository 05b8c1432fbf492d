package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.Tables
import graft.streaming.EventStreams

/** Phase-level decomposition of the two-run streaming harness
  * (guide §1: measure first) — answers "where do the ~2-7 s of each
  * stream_* bench median actually go" before any change is made.
  * Replicates stream_interval_join's structure with a stopwatch
  * around every phase, then repeats with candidate config changes so
  * the delta per knob is measured, not guessed. Diagnostic tool, not
  * part of the declared surface. */
object StreamProbe {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.tools.LocalDirs.ramLocalDir("sprobe"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runIntervalJoin(noDataBatches: Boolean, parts: Int,
        label: String): Unit = {
      println(s"=== interval_join $label (noData=$noDataBatches parts=$parts)")
      val s = spark
      val ev = t("read+project events") {
        Tables.events(s, sfDir).select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      }
      val bounds = t("bounds agg") {
        ev.agg(max(col("event_id")), min(col("ts")), max(col("ts"))).head()
      }
      val mid = bounds.getLong(0) / 2
      val spanSec = (bounds.getTimestamp(2).getTime -
        bounds.getTimestamp(1).getTime) / 1000L
      val delay = s"${spanSec + 86400L} seconds"
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", parts.toString)
      ss.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        noDataBatches.toString)
      val tmp = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "sprobe_ij")
      try {
        val in = s"$tmp/in"; val ck = s"$tmp/ck"; val out = s"$tmp/out"
        def runOnce(batch: DataFrame, tag: String): Unit = {
          t(s"$tag input write") {
            batch.repartition(8).write.mode("append").parquet(in)
          }
          def src() = ss.readStream.schema(batch.schema).parquet(in)
          val clicks = EventStreams.withEventTimeWatermark(
            src().filter(col("event_type") === "click")
              .select(col("event_id"), col("user_id"), col("ts")), delay = delay)
          val views = EventStreams.withEventTimeWatermark(
            src().filter(col("event_type") === "view"), delay = delay)
            .select(col("user_id"), col("ts").as("view_ts"),
              col("value").as("view_value"))
          val q = t(s"$tag stream start") {
            EventStreams.intervalJoin(clicks, views, "user_id",
              "ts", "view_ts", lowerSec = 1800L)
              .writeStream
              .option("checkpointLocation", ck)
              .trigger(Trigger.AvailableNow())
              .foreachBatch { (b: DataFrame, _: Long) =>
                b.write.mode("append").parquet(out)
              }
              .start()
          }
          t(s"$tag awaitTermination")(q.awaitTermination())
          q.recentProgress.foreach { p =>
            println(s"[probe]   $tag batch=${p.batchId} rows=${p.numInputRows} " +
              s"durationMs=${p.durationMs}")
          }
        }
        runOnce(ev.filter(col("event_id") <= mid), "run1")
        runOnce(ev.filter(col("event_id") > mid), "run2")
        t("readout") {
          s.read.parquet(out)
            .groupBy("event_id")
            .agg(count(lit(1)).as("n_views"),
              sum(col("view_value").cast("decimal(18,2)")).cast("double")
                .as("view_value_sum"))
            .orderBy("event_id")
            .localCheckpoint(true).count()
        }
      } finally graft.core.Fs.rmTree(tmp.toFile)
    }

    // warm once (codegen/JIT), then measure each variant twice
    runIntervalJoin(noDataBatches = true, parts = 8, "warm")
    runIntervalJoin(noDataBatches = true, parts = 8, "baseline-a")
    runIntervalJoin(noDataBatches = true, parts = 8, "baseline-b")
    runIntervalJoin(noDataBatches = false, parts = 8, "nodata-off-a")
    runIntervalJoin(noDataBatches = false, parts = 8, "nodata-off-b")
    spark.stop()
  }
}
