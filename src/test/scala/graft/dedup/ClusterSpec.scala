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

  test("iterative regimes release superseded checkpoint blocks") {
    import spark.implicits._
    // a 20-node path forces ~5 pointer-jump rounds; before the r9 fix
    // each round's localCheckpoint (plus the symmetrized edge set and
    // the initial label frame) stayed persisted until driver GC +
    // ContextCleaner — ~8 leaked RDDs per call. After the fix only the
    // RETURNED frame's checkpoint may remain resident. The bound is 4,
    // not 1, to tolerate suites sharing this session in parallel.
    val chain = (0L until 19L).map(i => (i, i + 1))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Cluster.connectedComponents(chain.toDF("src", "dst"), localThreshold = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L)) // release must not change the answer
    val leakedLp = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leakedLp.size <= 4, s"label propagation leaked ${leakedLp.size} persisted RDDs")

    // min-edge contraction returns a driver-built frame: net zero new
    // persisted RDDs once its per-round checkpoints are released
    val before2 = spark.sparkContext.getPersistentRDDs.keySet
    val got2 = Cluster.connectedComponents(chain.toDF("src", "dst"), localThreshold = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2.values.toSet == Set(0L))
    val leakedMc = spark.sparkContext.getPersistentRDDs.keySet -- before2
    assert(leakedMc.size <= 3, s"min-edge contraction leaked ${leakedMc.size} persisted RDDs")
  }

  test("label propagation: 100k-node chain + giant star converge in O(log n) rounds without checkpoint accumulation") {
    import org.apache.spark.sql.functions._
    // Adversarial topology for min-label propagation (VERDICT r9 item 6):
    //  - a 100,001-node path (0-1-...-100000): worst case for plain
    //    propagation, which would need 100k rounds to carry label 0 to
    //    the far end; pointer jumping must compress that to O(log n)
    //  - a 50k-spoke star hanging off the path's far end (hub 100000,
    //    spokes 200001..250000): the giant component now mixes maximum
    //    diameter with maximum degree in one component
    //  - a second 100-spoke star (hub 900000): convergence must be
    //    global, not per-component
    val chain = spark.range(100000L)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val bigStar = spark.range(200001L, 250001L)
      .select(lit(100000L).as("src"), col("id").as("dst"))
    val smallStar = spark.range(900001L, 900101L)
      .select(lit(900000L).as("src"), col("id").as("dst"))
    val edges = chain.union(bigStar).union(smallStar)

    val before = spark.sparkContext.getPersistentRDDs.keySet
    // localThreshold=1000: 150,101 edges and ~150k nodes both exceed it,
    // forcing regime 3 (distributed label propagation + pointer jumping)
    val result = Cluster.connectedComponents(edges, localThreshold = 1000)
    val byComponent = result.groupBy("component").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain ∪ big star = one giant component labeled 0 (min id);
    // the detached star keeps its own min label
    assert(byComponent == Map(0L -> 150001L, 900000L -> 101L))

    val stats = Cluster.lastStats.get
    assert(stats.regime == "label-propagation", stats)
    // propagate-then-jump roughly doubles the distance a min label has
    // covered each round → O(log2 n) rounds on a length-100k path
    // (observed ~17). 2*ceil(log2 100001)+2 = 36 is the generous bound;
    // the point is rounds ≪ diameter (a linear regression would hit
    // maxIter=50 and return under-merged labels, failing the component
    // assert above long before this one).
    assert(stats.rounds <= 36,
      s"label propagation took ${stats.rounds} rounds on a 100k-diameter graph")

    // ~17 rounds × (1 localCheckpoint per round) must not accumulate:
    // every superseded round is released the moment its last reader
    // finishes. Only the returned frame's checkpoint (plus parallel
    // suites sharing this session) may remain.
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 4,
      s"label propagation leaked ${leaked.size} persisted RDDs over ${stats.rounds} rounds")
  }

  test("pre-contraction: components invariant, edge volume bounded by nodes") {
    import spark.implicits._
    // shapes that straddle partitions on purpose: a clique (the dense
    // near-dup family pre-contraction exists for), a chain, stars —
    // shuffled into 7 partitions so every local union-find sees a
    // fragment, never a whole component
    val clique = for (a <- 0L to 60L; b <- (a + 1) to 60L) yield (a, b)
    val chain = (100L until 160L).map(i => (i, i + 1))
    val star = (300L until 340L).map(i => (200L, i))
    val edges = scala.util.Random.shuffle(clique ++ chain ++ star)
    val df = edges.toDF("src", "dst").repartition(7)
    val want = cc(edges)

    val contracted = Cluster.preContract(df)
    val cRows = contracted.collect().map(r => (r.getLong(0), r.getLong(1)))
    // ≤ one output edge per node per partition, and far fewer than the
    // clique's edge count
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(cRows.length < edges.length)
    assert(cRows.length <= 7 * nodes.size)
    // every edge-connected node survives the pass
    assert(cRows.flatMap(e => Seq(e._1, e._2)).toSet == nodes.toSet)
    // and the contracted graph carries bit-identical components
    val got = Cluster.connectedComponents(contracted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("pre-contraction engages above the local threshold and is stamped in stats") {
    import spark.implicits._
    // a 40-node clique: 780 directed edges (1560 symmetrized) exceed
    // localThreshold=1000, so the pre-contraction pass runs before
    // regime selection — and its output (≤ nodes·partitions star
    // edges) is what the regime iterates over
    val clique = for (a <- 0L to 39L; b <- (a + 1) to 39L) yield (a, b)
    val got = Cluster.connectedComponents(
      clique.toDF("src", "dst"), localThreshold = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L) && got.keySet == (0L to 39L).toSet)
    val stats = Cluster.lastStats.get
    assert(stats.contractedEdges >= 0L, stats)
    assert(stats.contractedEdges < 780L, stats)
  }

  test("edge-count hint gates the pre-contraction: bit-equal results both sides") {
    import spark.implicits._
    // mixed shapes across partitions — the same adversarial mix the
    // invariance spec uses — run three ways: no hint (pre-contraction
    // path), a proving hint (direct collect, pre-contraction skipped),
    // and an over-threshold hint (gate must NOT fire)
    val clique = for (a <- 0L to 30L; b <- (a + 1) to 30L) yield (a, b)
    val chain = (100L until 140L).map(i => (i, i + 1))
    val star = (300L until 320L).map(i => (200L, i))
    val edges = clique ++ chain ++ star
    val df = edges.toDF("src", "dst").repartition(5)

    Cluster.clearStats()
    val unhinted = Cluster.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val statsUnhinted = Cluster.lastStats.get
    assert(statsUnhinted.contractedEdges >= 0L, statsUnhinted) // pre-contraction ran

    Cluster.clearStats()
    val hinted = Cluster.connectedComponents(df, edgeCountHint = edges.size.toLong)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val statsHinted = Cluster.lastStats.get
    assert(statsHinted.regime == "local-union-find", statsHinted)
    assert(statsHinted.contractedEdges == -1L, statsHinted) // pre-contraction skipped
    assert(hinted == unhinted)

    // a hint that does NOT prove the set small must leave the normal
    // path (pre-contraction + regime selection) untouched
    Cluster.clearStats()
    val bigHint = Cluster.connectedComponents(df,
      localThreshold = 100, edgeCountHint = edges.size.toLong)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Cluster.lastStats.get.contractedEdges >= 0L, Cluster.lastStats.get)
    assert(bigHint == unhinted)
  }

  test("re-contraction pass below the payoff bar is still adopted when smaller") {
    import spark.implicits._
    // A graph whose alternating-key pass shrinks the set a little but
    // under 30%: components must be unchanged regardless of whether
    // the pass was adopted (any prefix of passes preserves
    // components); this pins the ADVICE r15 adopt-when-smaller change
    // against the invariance contract.
    val rnd = new scala.util.Random(41)
    val edges = (1 to 4000).map(_ =>
      (rnd.nextInt(1500).toLong, rnd.nextInt(1500).toLong))
      .filter { case (a, b) => a != b }
    val want = cc(edges)
    val got = Cluster.connectedComponents(
      edges.toDF("src", "dst").repartition(11), localThreshold = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("contraction + distributed path agree with union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // mixed shapes: a dense clique, long chains, stars, isolated pairs
    val clique = for (a <- 100L to 130L; b <- (a + 1) to 130L) yield (a, b)
    val chain = (200L until 240L).map(i => (i, i + 1))
    val random = (1 to 150).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val edges = clique ++ chain ++ random
    // ground truth: local union-find (localThreshold = huge)
    val want = cc(edges)
    // threshold between node count (~130) and edge count (~1300)
    // forces the min-edge contraction regime; threshold 1 forces the
    // distributed label-propagation regime — both must agree
    for (threshold <- Seq(200L, 1L)) {
      val forced = Cluster.connectedComponents(
        edges.toDF("src", "dst"), localThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(forced == want, s"localThreshold=$threshold")
    }
  }
}
