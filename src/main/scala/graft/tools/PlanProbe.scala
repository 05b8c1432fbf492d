package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimized-plan probe: print a named query's optimized logical plan
  * and count occurrences of a marker substring (default: the suffix
  * fixpoint's regex) — a direct read on how many times Catalyst
  * inlined an expensive derived expression after CollapseProject /
  * filter-inlining. Usage:
  *   runMain graft.tools.PlanProbe <query> [marker] [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_blocking")
    val marker = args.lift(1).getOrElse("regexp_replace")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    val n = marker.r.findAllMatchIn(opt).size
    println(s"=== $name: $n occurrences of '$marker' in optimizedPlan (${opt.length} chars)")
    println(opt.take(6000))
    spark.stop()
  }
}
