package graft.ext

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

class KmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  /** (vec_id, cluster, cluster_size) triples. */
  private def run(vecs: Seq[(Long, Array[Float])], k: Int, iters: Int = 2,
      shufflePartitions: Int = 4): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val p = Ann.prepared(vecs.toDF("vec_id", "embedding"))
      .repartition(shufflePartitions)
    Ann.kmeans(p, k, iters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
  }

  test("two well-separated groups split into two clusters") {
    // lowest two ids (the seeds) sit in DIFFERENT groups, so Lloyd's
    // converges to the natural split in one round
    val got = run(Seq(
      1L -> Array(10f, 0f), 2L -> Array(0f, 10f),
      3L -> Array(11f, 1f), 4L -> Array(1f, 9f),
      5L -> Array(9f, -1f), 6L -> Array(-1f, 11f)), k = 2)
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byCluster.values.toSet == Set(Set(1L, 3L, 5L), Set(2L, 4L, 6L)))
    assert(got.forall(_._3 == 3L))
  }

  test("seeds follow vec_id order: cluster labels are 0-based ranks") {
    val got = run(Seq(
      4L -> Array(0f, 10f), 3L -> Array(10f, 0f),
      8L -> Array(0f, 11f), 7L -> Array(11f, 0f)), k = 2)
    // lowest id 3 seeds label 0 (the x-group), id 4 seeds label 1
    assert(got.contains((3L, 0L, 2L)) && got.contains((4L, 1L, 2L)))
    assert(got.contains((7L, 0L, 2L)) && got.contains((8L, 1L, 2L)))
  }

  test("assignment is deterministic across partitionings and reruns") {
    val vecs = (1L to 40L).map(i =>
      i -> Array((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat))
    val a = run(vecs, k = 4, shufflePartitions = 1)
    val b = run(vecs.reverse, k = 4, shufflePartitions = 7)
    assert(a == b)
  }

  test("exact duplicate vectors always share a cluster") {
    val e = Array(1f, 2f, 3f)
    val got = run(Seq(1L -> e, 2L -> Array(5f, 5f, 5f), 3L -> e, 4L -> e), k = 2)
    val cl = got.map { case (id, c, _) => id -> c }.toMap
    assert(Set(1L, 3L, 4L).map(cl) == Set(cl(1L)))
  }

  test("Lloyd's objective is non-increasing with more iterations") {
    import spark.implicits._
    val vecs = (1L to 60L).map(i =>
      i -> Array((i * 37 % 11).toFloat, (i * 53 % 13).toFloat, (i * 29 % 7).toFloat))
    def inertia(iters: Int): Double = {
      val p = Ann.prepared(vecs.toDF("vec_id", "embedding"))
      Ann.kmeans(p, k = 4, iters).agg(
        org.apache.spark.sql.functions.sum("d2")).head().getDouble(0)
    }
    val i1 = inertia(1); val i2 = inertia(2); val i3 = inertia(3)
    // 1e-6 slack: d2 is rounded to 4 dp per vector before summing
    assert(i2 <= i1 + 1e-6 && i3 <= i2 + 1e-6, s"$i1 -> $i2 -> $i3")
  }

  test("converged centroids are the exact component means of their members") {
    import spark.implicits._
    // two tight groups; after one round each centroid is the plain
    // mean of its group's components
    val vecs = Seq(
      1L -> Array(10f, 0f), 2L -> Array(0f, 10f),
      3L -> Array(12f, 2f), 4L -> Array(2f, 12f))
    val p = Ann.prepared(vecs.toDF("vec_id", "embedding"))
    val cents = Ann.kmeansCentroids(p, k = 2, iters = 1).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cents((0, 0)) == 11.0 && cents((0, 1)) == 1.0) // mean of {1,3}
    assert(cents((1, 0)) == 1.0 && cents((1, 1)) == 11.0) // mean of {2,4}
  }

  test("PQ invariants: full coverage, codes in range, nonneg recon error") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val n = graft.core.Tables.embeddings(spark, dir).count()
    val rows = graft.SparkEntry.queries("ann_pq")(spark, dir).collect()
    assert(rows.length.toLong == n)
    rows.foreach { r =>
      (1 to 4).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) < 8))
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("cluster sizes are consistent with the assignment") {
    val vecs = (1L to 20L).map(i => i -> Array(i.toFloat, (i * i % 13).toFloat))
    val got = run(vecs, k = 3)
    assert(got.map(_._1).size == 20)
    got.groupBy(_._2).foreach { case (_, members) =>
      assert(members.forall(_._3 == members.size.toLong))
    }
  }
}
