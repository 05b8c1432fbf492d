package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time named SparkEntry queries (3 reps, times printed
  * raw) with per-rep CC-regime diagnostics when the dedup cluster
  * path ran. Usage:
  *   runMain graft.tools.ProfileQuery <sfDir> [--noop] <name> [name...]
  *
  * Default evaluation is `.count()` (the Bench methodology — but note
  * Catalyst prunes computed columns nothing downstream reads, so a
  * query whose cost IS a computed column, e.g. span-dedup's cleaned
  * text, under-measures). `--noop` evaluates via the noop sink
  * instead: every output column is materialized, which is what a
  * consumer writing the result actually pays.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val noop = args.contains("--noop")
    val names = args.drop(1).toSeq.filterNot(_ == "--noop")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val localDir = LocalDirs.ramLocalDir("profile")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    @annotation.nowarn("cat=deprecation")
    def storageMb(): Long =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / (1024L * 1024L)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n =
          if (noop) { df.write.format("noop").mode("overwrite").save(); -1L }
          else df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val cc = graft.dedup.Cluster.lastStats
          .map(s => s" cc=${s.regime}/${s.rounds}").getOrElse("")
        val stage = graft.dedup.Matching.lastStageStats
          .map(s => s" stage=${s.regime}/${s.jwPasses}jw").getOrElse("")
        println(f"[profile] $name rep$rep rows=$n $sec%.2f s storage=${storageMb()}MB$cc$stage")
      }
    }
    spark.stop()
  }
}
