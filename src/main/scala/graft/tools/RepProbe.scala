package graft.tools

import org.apache.spark.sql.SparkSession

/** Repetition-stability probe: run ONE named query N times in a fresh
  * session and print per-rep wall time plus JVM GC time deltas —
  * separates "this query gets slower with repetition" (stateful: cache
  * eviction, cleaner backlog, codegen cache thrash) from one-off
  * environment noise. Usage:
  *   runMain graft.tools.RepProbe <query> [reps] [sfDir]
  */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ann_dedup_clusters")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // --preload (4th arg): run every registered query once first, so
    // the probe measures the query in a "late in a full bench pass"
    // session — distinguishes per-query state from cross-query state.
    if (args.lift(3).contains("--preload")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, f) =>
        if (n != name) try f(spark, sfDir).count() catch { case _: Throwable => () }
      }
      println(f"preload of ${graft.SparkEntry.queries.size - 1} queries: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    (1 to reps).foreach { i =>
      val g0 = gcMillis
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"rep $i%2d  ${sec}%7.3f s   gc +${gcMillis - g0}%5d ms")
    }
    spark.stop()
  }
}
