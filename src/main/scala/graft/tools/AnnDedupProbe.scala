package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage timings of the embedding near-dup DEDUP
  * composition (candidate pairs → connected components → labeled
  * corpus) under a chosen plane count and hot-bucket cap — the
  * breakdown behind SCALE.md's governed-vs-fixed sf10 rows. Usage:
  *   runMain graft.tools.AnnDedupProbe <sfDir> [nPlanes] [cap]
  * (nPlanes defaults to the volume governor's pick; cap defaults to
  * the production AnnBucketCap, 0 = uncapped). */
object AnnDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", LocalDirs.ramLocalDir("anndedup"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val prep = graft.ext.Ann.prepared(
      graft.core.Tables.embeddings(spark, dir)).cache()
    val n = t("prep cache + count")(prep.count())
    val planes = args.lift(1).map(_.toInt)
      .getOrElse(graft.queries.AnnQueries.planesFor(n))
    val cap = args.lift(2).map(_.toInt)
      .getOrElse(graft.queries.AnnQueries.AnnBucketCap)
    val bucketCap = if (cap > 0) Some(cap) else None
    println(s"[probe] n=$n planes=$planes cap=$bucketCap")
    val planeVals = graft.ext.Ann.hyperplanes(planes, 64)
    // steady-state: run the chain twice, read the second pass
    (1 to 2).foreach { pass =>
      val pairs = t(s"pass$pass lshPairs(cos>=0.30) checkpoint")(
        graft.ext.Ann.lshPairs(prep, planeVals, minCos = 0.30,
            bucketCap = bucketCap,
            window = graft.queries.AnnQueries.AnnNeighborWindow)
          .localCheckpoint(true))
      val nPairs = t(s"pass$pass pairs count")(pairs.count())
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      val comps = t(s"pass$pass connectedComponents")(
        graft.dedup.Cluster.connectedComponents(edges).localCheckpoint(true))
      val nComps = t(s"pass$pass comps count")(comps.count())
      val labeled = t(s"pass$pass label join + window + sort count") {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
        prep.select(col("vec_id"))
          .join(comps.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("component"), col("vec_id")).as("cluster_id"))
          .withColumn("cluster_size", count(lit(1)).over(w))
          .count()
      }
      println(s"[probe] pass$pass pairs=$nPairs compRows=$nComps labeled=$labeled " +
        s"ccStats=${graft.dedup.Cluster.lastStats}")
    }
    spark.stop()
  }
}
