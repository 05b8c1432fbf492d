package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

class ClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Cluster.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain graph collapses to min label (pointer jumping)") {
    // 0-1-2-...-19 as a path: worst case for plain propagation
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 19L).toSet)
  }

  test("multiple components + triangle + isolated pair") {
    val edges = Seq((5L, 3L), (3L, 8L), (5L, 8L), (10L, 11L), (20L, 21L), (21L, 22L))
    val got = cc(edges)
    assert(got(5L) == 3L && got(8L) == 3L && got(3L) == 3L)
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L && got(22L) == 20L)
  }

  test("two stars sharing one node") {
    val edges = (1L to 5L).map(i => (0L, i)) ++ (5L to 9L).map(i => (i, i + 100))
    val got = cc(edges)
    assert(got.values.toSet == Set(0L, 6L, 7L, 8L, 9L))
  }
}
