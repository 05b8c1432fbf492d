package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JVM/codegen/parquet-reader init shouldn't be
    // attributed to whichever query happens to run first
    try {
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.groupBy("r_name").count().count()
    } catch { case _: Throwable => () }
    // timed index build: materialize the session-shared Memo tables
    // (dedup pipeline, LSH signature indexes, prepared vectors) so
    // per-query numbers measure the query, not cache-fill order. The
    // build cost is reported separately and included in the total.
    val ti = System.nanoTime()
    try {
      graft.queries.DedupQueries.warmIndexes(spark, sfDir)
      graft.queries.TextQueries.warmIndexes(spark, sfDir)
      graft.queries.AnnQueries.warmIndexes(spark, sfDir)
    } catch { case _: Throwable => () }
    val indexBuild = (System.nanoTime() - ti) / 1e9
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = indexBuild + (if (results.nonEmpty) results.values.sum else 0.0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","index_build":$indexBuild,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
