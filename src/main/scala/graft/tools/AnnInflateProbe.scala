package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisect the sf10 ann-family cross-query inflation (VERDICT r16
  * item 2): `ann_dedup_clusters` measured 6.0 s median isolated but
  * 17.7 s late in a 26-query family pass, with monotonically growing
  * reps — "cross-query session state" was the hypothesis, this probe
  * names the mechanism. It interleaves repeated measurement blocks of
  * the composition with suspect query groups and per-rep telemetry
  * (wall, GC delta, storage-pool MB, cached-RDD count, shuffle
  * local-dir bytes, heap), then tries targeted releases to see which
  * one buys the time back:
  *
  *   runMain graft.tools.AnnInflateProbe [sfDir] [repsPerBlock]
  *
  * Reading the output: if storage MB / cached-RDD count climbs with
  * the groups and the composition recovers after `release_truth` or
  * `clear_cache`, the cause is storage-pool pressure (Memo'd tables +
  * leaked checkpoint blocks); if local-dir bytes climb and `gc_sweep`
  * recovers it, it's accumulated shuffle files pinned by unreferenced
  * RDDs awaiting the ContextCleaner; if nothing recovers but GC
  * deltas climb, it's plain heap debt. */
object AnnInflateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val target = "ann_dedup_clusters"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = LocalDirs.ramLocalDir("inflateprobe")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    @annotation.nowarn("cat=deprecation")
    def storage: (Long, Int) = {
      val info = spark.sparkContext.getRDDStorageInfo
      (info.map(_.memSize).sum / (1024L * 1024L), info.length)
    }
    def dirBytes(p: java.io.File): Long = {
      val kids = p.listFiles()
      if (kids == null) p.length()
      else kids.map(dirBytes).sum
    }
    def localBytes: Long = dirBytes(new java.io.File(localDir)) / (1024L * 1024L)
    def heapMb: Long = {
      val rt = Runtime.getRuntime
      (rt.totalMemory - rt.freeMemory) / (1024L * 1024L)
    }

    val fn = graft.SparkEntry.queries(target)
    def repBlock(tag: String): Unit = {
      (1 to reps).foreach { i =>
        val g0 = gcMillis
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val (stMb, nRdd) = storage
        println(f"[$tag] rep $i%2d  $sec%7.3f s  gc+${gcMillis - g0}%5d ms  " +
          f"storage ${stMb}%5d MB ($nRdd%3d rdds)  localdir ${localBytes}%5d MB  heap ${heapMb}%5d MB")
      }
    }

    println(s"== AnnInflateProbe sf=$sfDir target=$target reps/block=$reps ==")
    val tw = System.nanoTime()
    graft.queries.AnnQueries.warmIndexes(spark, sfDir)
    println(f"warmIndexes: ${(System.nanoTime() - tw) / 1e9}%.1f s")
    repBlock("baseline")

    val groups: Seq[(String, Seq[String])] = Seq(
      "recall_audits" -> Seq("ann_recall", "ann_recall_curve", "ann_pq_recall",
        "ann_ivf_pq_recall", "ann_ivf_pq_persist_recall"),
      "lsh_joins" -> Seq("ann_lsh_pairs", "ann_lsh_pairs_fixed",
        "ann_lsh_pairs_governed"),
      "index_lifecycle" -> Seq("ann_ivf_pq", "ann_ivf_pq_persist",
        "ann_ivf_pq_encode", "ann_ivf_pq_remove"),
      "kmeans_family" -> Seq("ann_kmeans", "ann_kmeans_stats", "ann_semdedup",
        "ann_semdedup_kmeans"),
      "sibling_compositions" -> Seq("ann_dedup_clusters_fixed",
        "ann_dedup_clusters_governed", "ann_dedup_clusters_sample"))
    groups.foreach { case (tag, qs) =>
      val t0 = System.nanoTime()
      qs.foreach { q =>
        try graft.SparkEntry.queries(q)(spark, sfDir).count()
        catch { case e: Throwable => println(s"  ($q failed: ${e.getMessage.take(80)})") }
      }
      println(f"group $tag ran in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      repBlock(s"after_$tag")
    }

    // targeted releases, cheapest-to-most-invasive; whichever one buys
    // the baseline time back names the mechanism
    println("-- release: System.gc + cleaner drain --")
    System.gc(); Thread.sleep(2000)
    repBlock("gc_sweep")
    println("-- release: drop the recall ground-truth Memo tables --")
    graft.core.Memo.invalidate(spark, "ann_cos_truth")
    graft.core.Memo.invalidate(spark, "ann_l2_truth")
    System.gc(); Thread.sleep(1000)
    repBlock("release_truth")
    println("-- release: clear ALL cached tables (Memo rebuilds on demand) --")
    graft.core.Memo.invalidate(spark, "ann")
    System.gc(); Thread.sleep(1000)
    val tw2 = System.nanoTime()
    graft.queries.AnnQueries.warmIndexes(spark, sfDir)
    println(f"re-warm after full invalidate: ${(System.nanoTime() - tw2) / 1e9}%.1f s")
    repBlock("fresh_memo")
    spark.stop()
  }
}
