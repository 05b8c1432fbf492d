package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the dense recompute-aggregate regime (Matching
  * .denseAggregatedStage) against the other two execution regimes of
  * the name-level stage: the SAME input run through (a) the driver
  * fast path, (b) the distributed materialize-checkpoint path, and
  * (c) the dense path must produce byte-identical pipeline output —
  * the regimes are execution knobs, never semantics. This is the
  * gate for the sf1 supplier clique, whose DuckDB twin is
  * oracle-infeasible (41M qualifying pairs): the dense path is
  * equivalence-pinned here, and the materialize path it must match
  * IS oracle-gated at sf0.01/sf0.1. */
class DensePathSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  /** A supplier-like miniature: pairwise-similar distinct names (one
    * dense block) plus a second disjoint family plus unmatchable
    * noise — multi-component so CC does real merging, multi-conf so
    * the candidate reduction is exercised. */
  private def input = {
    import spark.implicits._
    val dense = (1 to 120).map(i => (i.toLong, f"Supplier#$i%09d"))
    val other = (201 to 240).map(i => (i.toLong, f"Vendor Corp $i%04d"))
    val noise = Seq((301L, "zzz completely unrelated alpha"),
      (302L, "qqq different thing beta"))
    (dense ++ other ++ noise).toDF("id", "name")
  }

  private def runWith(settings: DedupSettings): Array[String] =
    Pipeline.run(input, "name", "id", settings)
      .orderBy("row_order")
      .collect()
      .map(_.mkString("|"))

  test("driver, materialized and dense regimes are bit-identical end-to-end") {
    // (a) driver fast path (the default gate admits 162 names)
    val driver = runWith(DedupSettings())
    // (b) distributed materialize path: driver path off, dense gate
    // effectively infinite
    val materialized = runWith(DedupSettings(
      driverFastPathNames = 0L, densePairEstimate = Long.MaxValue))
    // (c) dense recompute-aggregate path: driver path off, dense gate
    // zero so ANY pair estimate crosses it
    val dense = runWith(DedupSettings(
      driverFastPathNames = 0L, densePairEstimate = 0L))

    assert(driver.length == 162)
    // the regime observability must report what actually ran — the
    // last runWith above was the dense one
    assert(Matching.lastStageStats.exists(_.regime == "dense-recompute"),
      s"expected dense-recompute to have run, got ${Matching.lastStageStats}")
    assert(materialized.sameElements(driver),
      "materialized path diverged from driver fast path")
    assert(dense.sameElements(driver),
      "dense recompute-aggregate path diverged from driver fast path")
  }

  test("dense path merges multi-round graphs (chain forcing Borůvka iterations)") {
    import spark.implicits._
    // A name chain where only adjacent names qualify: A1~A2~A3...
    // forces union rounds beyond round 1 if min-edge round-1 unions
    // don't finish the chain. Names chosen so JW(adjacent) >= 0.90
    // but JW(distant) < 0.85.
    val chain = Seq(
      (1L, "ALPHABETIC NAME ONE AAAA"),
      (2L, "ALPHABETIC NAME ONE AAAB"),
      (3L, "ALPHABETIC NAME ONE AABB"),
      (4L, "ALPHABETIC NAME ONE ABBB"),
      (5L, "ALPHABETIC NAME ONE BBBB")).toDF("id", "name")
    val dense = Pipeline.run(chain, "name", "id",
        DedupSettings(driverFastPathNames = 0L, densePairEstimate = 0L))
      .select("row_order", "cluster_id").orderBy("row_order").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val driver = Pipeline.run(chain, "name", "id", DedupSettings())
      .select("row_order", "cluster_id").orderBy("row_order").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(dense.sameElements(driver),
      s"dense=${dense.toSeq} driver=${driver.toSeq}")
  }
}
