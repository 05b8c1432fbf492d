package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the supplier pipeline stages (dev tool). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/testdata/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val mode = args.lift(1).getOrElse("all")
    if (mode != "pipeline") {
      val derived = graft.dedup.Normalize.withDerived(
        graft.core.Tables.supplier(spark, dir), "s_name", "s_suppkey")
      val stats = t("nameStats")(graft.dedup.Matching.nameStats(derived).cache())
      t("stats count")(println(stats.count()))
      val pairs = t("pairs join + checkpoint")(
        graft.dedup.Matching.qualifyingPairs(stats).localCheckpoint(true))
      t("pairs count")(println(pairs.count()))
      val edges = pairs.select(col("a_min_row").as("src"), col("b_min_row").as("dst"))
      val comps = t("connectedComponents")(
        graft.dedup.Cluster.connectedComponents(edges))
      t("comps count")(println(comps.count()))
    }
    if (mode != "cc") {
      val full = t("full pipeline")(
        graft.dedup.Pipeline.run(graft.core.Tables.supplier(spark, dir),
          "s_name", "s_suppkey"))
      t("full count")(println(full.count()))
    }
    if (mode == "steps") {
      import graft.dedup._
      val derived = Normalize.withDerived(
        graft.core.Tables.supplier(spark, dir), "s_name", "s_suppkey")
        .select("row_order", "original_name", "normalized_name", "base_name", "block_key")
      val stats = t("s:nameStats")(Matching.nameStats(derived))
      val pairs = t("s:pairs checkpoint")(
        Matching.qualifyingPairs(stats).localCheckpoint(true))
      val edges = pairs.select(col("a_min_row").as("src"), col("b_min_row").as("dst"))
      val comps = t("s:cc")(Cluster.connectedComponents(edges))
      t("s:cc count")(println(comps.count()))
    }
    spark.stop()
  }
}
