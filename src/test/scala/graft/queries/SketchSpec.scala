package graft.queries

import graft.core.Tables
import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the sketch query (no oracle twin possible —
  * sketch outputs are algorithm-specific): HLL++ distinct counts
  * within its published relative-error envelope, approximate median
  * within the rank tolerance implied by the accuracy parameter. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("sketches land within error bounds of the exact answers") {
    assume(new java.io.File(s"$sfDir/orders.parquet").exists())
    val approx = graft.SparkEntry.queries("rel_sketch_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("customers"),
        expr("percentile(o_totalprice, 0.5)").as("median_price"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((k, a) <- approx) {
      val e = exact(k)
      val relErr = math.abs(a.getLong(1).toDouble - e.getLong(1)) / e.getLong(1)
      assert(relErr < 0.05, s"$k distinct: approx ${a.getLong(1)} vs ${e.getLong(1)}")
      val medErr = math.abs(a.getDouble(2) - e.getDouble(2)) / e.getDouble(2)
      assert(medErr < 0.05, s"$k median: approx ${a.getDouble(2)} vs ${e.getDouble(2)}")
    }
  }

  test("sketch aggregation uses partial (map-side) merge, not a full-row shuffle") {
    assume(new java.io.File(s"$sfDir/orders.parquet").exists())
    val plan = graft.SparkEntry.queries("rel_sketch_stats")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // partial_ aggregate before the exchange = mergeable sketch state
    assert(plan.contains("partial_approx_count_distinct") ||
      plan.contains("partial_"), plan.take(1200))
  }
}
