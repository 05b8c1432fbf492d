package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase timing of the four family warm-index hooks (index_build in
  * the bench artifact, 13.9 s of the r21 baseline's 75 s total) —
  * measure which Memo build inside each hook carries the cost before
  * changing anything. Diagnostic tool, not part of the declared
  * surface. */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.tools.LocalDirs.ramLocalDir("wprobe"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // generic JVM/parquet warm like Bench
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()

    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[warm] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    t("ann total")(graft.queries.AnnQueries.warmIndexes(spark, sfDir))
    t("dedup total")(graft.queries.DedupQueries.warmIndexes(spark, sfDir))
    t("mm total")(graft.queries.MultimodalQueries.warmIndexes(spark, sfDir))
    t("text total")(graft.queries.TextQueries.warmIndexes(spark, sfDir))
    spark.stop()
  }
}
