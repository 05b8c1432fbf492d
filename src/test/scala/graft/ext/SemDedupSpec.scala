package graft.ext

import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def run(rows: Seq[(Long, Array[Float], Int)], minCos: Double) = {
    import spark.implicits._
    val emb = rows.toDF("vec_id", "embedding", "label")
    val p = Ann.prepared(emb)
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
    Ann.semDedup(p, minCos).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toSet
  }

  test("exact copies within a cluster dedup to the lowest id") {
    val e = Array(1.0f, 0.0f, 0.0f)
    val got = run(Seq(
      (1L, e, 0), (2L, e, 0), (3L, e, 0), // copies, same cluster
      (4L, Array(0.0f, 1.0f, 0.0f), 0)), // orthogonal, same cluster
      minCos = 0.9)
    assert(got == Set((1L, -1L, false), (2L, 1L, true), (3L, 1L, true),
      (4L, -1L, false)))
  }

  test("dedup is cluster-scoped: identical vectors in different clusters both survive") {
    val e = Array(1.0f, 1.0f, 0.0f)
    val got = run(Seq((1L, e, 0), (2L, e, 1)), minCos = 0.9)
    assert(got == Set((1L, -1L, false), (2L, -1L, false)))
  }

  test("dup_of is the LOWEST qualifying id, not just any cluster-mate") {
    val e = Array(0.5f, 0.5f, 0.5f)
    // 5 dups of 1: every one of 2..5 records dup_of=1 (not a chain)
    val got = run((1L to 5L).map(i => (i, e, 0)), minCos = 0.9)
    assert(got == Set((1L, -1L, false)) ++ (2L to 5L).map(i => (i, 1L, true)))
  }

  test("threshold is respected: sub-threshold cluster-mates are kept") {
    val got = run(Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 1.0f), 0)), // cos = 0.7071
      minCos = 0.8)
    assert(got.forall(!_._3))
  }

  test("zero-norm vectors never match anything (ANSI-safe at scale)") {
    val got = run(Seq(
      (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(0.0f, 0.0f), 0)), minCos = 0.1)
    assert(got.forall(!_._3))
  }
}
