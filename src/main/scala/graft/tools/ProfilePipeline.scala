package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.{DedupSettings, Matching, Normalize, Pipeline}

/** One-off stage profiler for the dedup pipeline warm path (dev
  * tool): where do the seconds of Pipeline.run(part) go at sf0.1? */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[pp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    val part = Tables.part(spark, dir)
    t("scan")(part.count())
    val derived = Normalize.withDerived(part, "p_name", "p_partkey")
      .select("row_order", "original_name", "normalized_name", "base_name", "block_key")
    t("derived")(derived.count())
    val stats = Matching.nameStats(derived)
    t("nameStats")(stats.count())
    val pairs = Matching.qualifyingPairs(stats, DedupSettings())
    t("qualifyingPairs")(pairs.count())
    val edges = pairs.select(col("a_min_row").as("src"), col("b_min_row").as("dst"))
    t("cc")(graft.dedup.Cluster.connectedComponents(edges).count())
    t("full Pipeline.run")(Pipeline.run(part, "p_name", "p_partkey").count())
    t("full again (no memo)")(Pipeline.run(part, "p_name", "p_partkey").count())
    spark.stop()
  }
}
