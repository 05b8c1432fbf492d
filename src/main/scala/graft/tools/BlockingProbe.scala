package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Normalize

/** One-off cost attribution for dedup_blocking's 10x-vs-normalize gap:
  * times the current query against variants that isolate (a) the
  * pushed-down filter's inlined derivation chain, (b) countDistinct's
  * expand, (c) a pre-materialized (cached) derived input. Usage:
  *   runMain graft.tools.BlockingProbe [sfDir]
  */
object BlockingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    def derived = Normalize.withDerived(part, "p_name", "p_partkey")

    def time(label: String)(f: => DataFrame): Unit = {
      f.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-34s median ${ts(1)}%.3f  reps ${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("normalize (projection only)")(derived
      .select("row_order", "original_name", "normalized_name", "base_name", "block_key"))
    time("blocking CURRENT")(derived
      .filter(col("base_name") =!= "")
      .groupBy("block_key")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("base_name")).as("n_names"),
        min(col("row_order")).as("min_row"))
      .orderBy("block_key"))
    time("blocking NO-FILTER")(derived
      .groupBy("block_key")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("base_name")).as("n_names"),
        min(col("row_order")).as("min_row"))
      .orderBy("block_key"))
    time("blocking NO-DISTINCT")(derived
      .filter(col("base_name") =!= "")
      .groupBy("block_key")
      .agg(count(lit(1)).as("n_rows"),
        min(col("row_order")).as("min_row"))
      .orderBy("block_key"))
    val cached = derived.cache(); cached.count()
    time("blocking CACHED-INPUT")(cached
      .filter(col("base_name") =!= "")
      .groupBy("block_key")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("base_name")).as("n_names"),
        min(col("row_order")).as("min_row"))
      .orderBy("block_key"))
    spark.stop()
  }
}
