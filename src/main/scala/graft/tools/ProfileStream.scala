package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time each streaming-family graded query at a given SF
  * under a configurable shuffle-partition count, to separate real
  * engine time from per-partition state-store file overhead. Usage:
  *   runMain graft.tools.ProfileStream <sfDir> <partitions> [names...]
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).getOrElse("32")
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val localDir = LocalDirs.ramLocalDir("profile")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.queries.StreamingQueries.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    // warm the JVM/codegen once
    spark.read.parquet(s"$sfDir/region.parquet").count()
    qs.foreach { case (name, fn) =>
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name rep$rep parts=$parts rows=$n $sec%.2f s")
      }
    }
    spark.stop()
  }
}
