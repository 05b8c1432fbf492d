package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** One-off profiling harness for the benchmark-decontamination path
  * (gram explode vs checkpoint vs semi-join shapes). Not part of the
  * library surface; kept for reproducing the round-2 measurements.
  */
object ProfileContam {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("scan")(docs.count())
    time("words explode")(docs.select(explode(TextOps.words(col("text")))).count())
    time("shingle explode")(docs.select(explode(TextOps.shingles(TextOps.words(col("text")), 4))).count())
    time("spread shingle explode")(docs.repartition(col("doc_id")).select(explode(TextOps.shingles(TextOps.words(col("text")), 4))).count())
    val grams = docs.repartition(col("doc_id")).select(col("doc_id"),
      explode(TextOps.shingles(TextOps.words(col("text")), 4)).as("g"))
    time("checkpoint grams")(grams.localCheckpoint(true).count())
    val g2 = grams.localCheckpoint(true)
    time("semi join")(g2.join(g2.select("g").distinct(), Seq("g"), "left_semi").select("doc_id").distinct().count())
    time("no-ckpt semi join")(grams.join(grams.select("g").distinct(), Seq("g"), "left_semi").select("doc_id").distinct().count())
    spark.stop()
  }
}
