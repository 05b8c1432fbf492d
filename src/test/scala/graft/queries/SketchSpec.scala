package graft.queries

import graft.core.Tables
import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy checks for the sketch query. The query itself now emits
  * sketch-vs-exact bound booleans the DuckDB oracle asserts true;
  * this spec additionally pins that (a) the booleans are true, (b)
  * the exact columns agree with an independent recomputation, and
  * (c) the raw sketch estimates land within a TIGHTER envelope than
  * the query's own 5-sigma bound, so the bound is not masking a
  * degraded sketch. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("sketches land within error bounds of the exact answers") {
    assume(new java.io.File(s"$sfDir/orders.parquet").exists())
    val out = graft.SparkEntry.queries("rel_sketch_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    // independently recompute the raw estimates + exact answers
    val raw = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("customers"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_customers"),
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("approx_median"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == raw.keySet && out.nonEmpty)
    for ((k, a) <- out) {
      val e = raw(k)
      assert(a.getBoolean(a.fieldIndex("approx_customers_ok")),
        s"$k: approx_customers_ok is false")
      assert(a.getBoolean(a.fieldIndex("approx_median_ok")),
        s"$k: approx_median_ok is false")
      assert(a.getLong(a.fieldIndex("exact_customers")) ==
        e.getLong(e.fieldIndex("customers")), s"$k exact_customers")
      assert(math.abs(a.getDouble(a.fieldIndex("exact_median_price")) -
        e.getDouble(e.fieldIndex("median_price"))) < 1e-9, s"$k exact median")
      val exactN = e.getLong(e.fieldIndex("customers"))
      val relErr = math.abs(
        e.getLong(e.fieldIndex("approx_customers")).toDouble - exactN) / exactN
      assert(relErr < 0.05, s"$k distinct rel err $relErr")
      val med = e.getDouble(e.fieldIndex("median_price"))
      val medErr = math.abs(e.getDouble(e.fieldIndex("approx_median")) - med) / med
      assert(medErr < 0.05, s"$k median rel err $medErr")
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
