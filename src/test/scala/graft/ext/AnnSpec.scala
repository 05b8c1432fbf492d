package graft.ext

import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private lazy val emb = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0L until 60L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  test("brute force matches a hand-rolled cosine on known vectors") {
    import spark.implicits._
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 1.0f), 0), (3L, Array(-1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val p = Ann.prepared(tiny)
    val got = Ann.bruteForceTopK(p.filter(col("vec_id") === 0), p, 3)
      .orderBy("rk").collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    // cos(e0, e2)=0.707107, cos(e0, e1)=0, cos(e0, e3)=-1
    assert(got == Seq((2L, 0.707107), (1L, 0.0), (3L, -1.0)))
  }

  test("IVF with full probe equals brute force") {
    val p = Ann.prepared(emb).cache()
    val q = p.filter(col("vec_id") % 10 === 0)
    val bf = Ann.bruteForceTopK(q, p, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ivf = Ann.ivfSearch(emb, q, nProbe = 4, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ivf == bf && bf.nonEmpty)
  }

  test("IVF with partial probe returns k results from probed buckets only") {
    val p = Ann.prepared(emb)
    val q = p.filter(col("vec_id") === 0)
    val res = Ann.ivfSearch(emb, q, nProbe = 2, k = 4).collect()
    assert(res.length == 4)
    val labels = res.map(_.getLong(2) % 4).toSet
    assert(labels.size <= 2) // neighbors come from at most 2 buckets
  }
}
