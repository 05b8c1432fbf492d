package graft.queries

import graft.dedup.SparkTest
import graft.ext.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The volume-governed sign-LSH plane count (VERDICT r13 item 5):
  * integer-exact sizing, prefix-stability of the shared hyperplane
  * table, and the refinement property that makes the governor safe —
  * more planes only ever SPLIT buckets, so the governed pair set is a
  * subset of the fixed-geometry pair set (cost falls, no pair is
  * invented). */
class AnnPlanesGovernorSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("planesFor: integer-exact log2 sizing, clamped to [6, 16]") {
    // below/at the 6-plane capacity (32·2^6 = 2048) nothing grows
    assert(AnnQueries.planesFor(0) == 6)
    assert(AnnQueries.planesFor(500) == 6) // sf0.001/sf0.01
    assert(AnnQueries.planesFor(2000) == 6) // sf0.1 — parity with the declared geometry
    assert(AnnQueries.planesFor(2048) == 6) // boundary is exclusive
    assert(AnnQueries.planesFor(2049) == 7)
    // each doubling of the corpus adds one plane (bucket size pinned)
    assert(AnnQueries.planesFor(20000) == 10) // sf1
    assert(AnnQueries.planesFor(200000) == 13) // sf10
    // clamp: a planet-scale corpus tops out at MaxPlanes
    assert(AnnQueries.planesFor(Long.MaxValue) == AnnQueries.MaxPlanes)
    // monotone non-decreasing across the whole lever range
    val pts = Seq(1L, 100L, 2048L, 2049L, 10000L, 65536L * 32, 1L << 40)
    val vals = pts.map(AnnQueries.planesFor)
    assert(vals == vals.sorted)
  }

  test("the declared 6-plane geometry is a prefix of the governed table") {
    // hyperplane component (j,d) depends only on (j,d), so the
    // governed table's first 6 planes ARE the declared planes —
    // governed buckets refine declared buckets bit-for-bit
    assert(AnnQueries.PlanesAll.take(6) == Ann.hyperplanes(6, 64))
    assert(AnnQueries.Planes == AnnQueries.PlanesAll.take(6))
  }

  test("governed pairs are a subset of fixed-geometry pairs (bucket refinement)") {
    import spark.implicits._
    // 3000 deterministic 64-dim vectors → planesFor = 7: the governed
    // run uses strictly more planes than the declared 6
    val n = 3000
    assert(AnnQueries.planesFor(n) == 7)
    val vecs = (0 until n).map { i =>
      (i.toLong, (0 until 64).map(d => math.sin(i * 0.37 + d * 1.13)))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"),
        lit(0L).as("label"))
    val prep = Ann.prepared(vecs)
    val fixed = Ann.lshPairs(prep, AnnQueries.Planes, minCos = 0.20)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val governed = Ann.lshPairs(prep,
      AnnQueries.PlanesAll.take(AnnQueries.planesFor(n)), minCos = 0.20)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(governed.nonEmpty, "governor spec needs a non-trivial pair set")
    assert(governed.subsetOf(fixed),
      s"governed produced ${governed.diff(fixed).size} pairs outside the fixed geometry")
    // and it genuinely refines: the 7th plane splits at least one bucket
    assert(governed.size < fixed.size)
  }
}
