package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: run the supplier dense-clique pipeline N times and
  * print wall + SPARK JOB COUNT + the regime/JW-pass stats per rep.
  * Built for the r18→r19 dedup_clusters_supplier drift bisect: wall
  * comparisons across separate runs on this box are confounded by
  * monotone interference waves (an A/B/A/B interleave makes whichever
  * binary runs LATER look slower), while job count + regime + pass
  * count are environment-independent — if those match across two
  * checkouts, a wall delta is the box, not the code. Usage:
  *   runMain graft.tools.StageProbe [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val sc = spark.sparkContext
    (1 to 3).foreach { i =>
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      graft.dedup.Pipeline.run(graft.core.Tables.supplier(spark, sfDir), "s_name", "s_suppkey")
        .select("row_order", "cluster_id", "cluster_size", "confidence").count()
    val wall = (System.nanoTime() - t0) / 1e9
      val after = sc.statusTracker.getJobIdsForGroup(null).length
      println(f"STAGEPROBE rep=$i wall=$wall%.2f jobs=${after - before} stage=${graft.dedup.Matching.lastStageStats} cc=${graft.dedup.Cluster.lastStats}")
    }
    spark.stop()
  }
}
