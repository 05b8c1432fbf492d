package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** One-off profiling harness for the shared Memo index builds that
  * Bench reports as `index_build`. Not part of the library surface. */
object ProfileIndex {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val NumSigs = 12
    // replicate TextQueries.withShingles / withSigs stage by stage
    val spread = graft.core.Tables.documents(spark, dir)
      .repartition(32, col("doc_id"))
    val sh = spread.withColumn("w", TextOps.words(col("text")))
      .select(col("doc_id"), TextOps.shingles(col("w"), 3).as("sh"))
    time("shingles.count")(sh.count())
    val dig = sh.withColumn("digests", TextOps.minhashDigests(col("sh"), NumSigs))
    time("digests.count")(dig.count())
    val sigs = (0 until NumSigs).foldLeft(dig) { (df, i) =>
      df.withColumn(s"sig_$i", TextOps.minhashSigFromDigests(col("digests"), i))
    }.drop("sh", "digests")
    time("sigs.count")(sigs.count())
    time("text.warmIndexes")(graft.queries.TextQueries.warmIndexes(spark, dir))
    time("ann.warmIndexes")(graft.queries.AnnQueries.warmIndexes(spark, dir))
    time("dedup.warmIndexes")(graft.queries.DedupQueries.warmIndexes(spark, dir))
    spark.stop()
  }
}
