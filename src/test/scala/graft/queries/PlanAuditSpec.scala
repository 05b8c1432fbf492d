package graft.queries

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits for the scale-critical claims: filters reach
  * the parquet scan, scans are column-pruned, small dims broadcast,
  * and nothing in the declared suite degenerates to a cartesian
  * product. These pin the PLAN, not the result — a regression that
  * silently un-pushes a filter or turns a hash join into a
  * nested-loop fails here even though results stay correct. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("pricing summary pushes the shipdate filter into the parquet scan") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val p = plan("rel_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
  }

  test("scans are column-pruned: events histogram reads only props") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val p = plan("events_json")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("props") && !readSchema.contains("user_id"),
      readSchema)
  }

  test("region revenue joins broadcast the dimension tables") {
    assume(new java.io.File(s"$sfDir/region.parquet").exists())
    val p = plan("rel_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("filter pipeline is shuffle-free up to the presentation sort") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val p = plan("text_filter_pipeline")
    // pure per-row expressions: the only Exchange allowed is the
    // rangepartitioning for the final orderBy
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("no declared query degenerates to a cartesian product") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    // ann_threshold_pairs and ann_topk are DELIBERATE probe-set
    // broadcast nested-loops (bounded side broadcast); everything
    // else must be hash/merge joins.
    val allowedNlj = Set("ann_threshold_pairs", "ann_topk", "ann_ivf", "ann_doc_topk")
    for ((name, _) <- graft.SparkEntry.queries if !allowedNlj(name)) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name has a cartesian product:\n${p.take(1500)}")
    }
  }
}
