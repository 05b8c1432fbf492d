package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed two-pass per-block ranking (Matching
  * .blockRanked) against the single-window row_number it replaces
  * above DistributedRankThreshold: identical (block_key, base_name,
  * rnk) triples on blocks that genuinely span multiple range
  * partitions — the 100 TB posture fix for hot sorted-neighborhood
  * blocks that would otherwise serialize onto one task. */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("blockRanked == window row_number across multi-partition blocks") {
    import spark.implicits._
    // two blocks, one big enough to span several range partitions
    val stats = ((1 to 5000).map(i => ("B_big", f"NAME $i%06d")) ++
      (1 to 37).map(i => ("A_small", f"OTHER $i%04d")))
      .toDF("block_key", "base_name")
      .withColumn("n_rows", lit(1L))
      .withColumn("min_row", monotonically_increasing_id())
      .withColumn("max_row", col("min_row"))
      .withColumn("token_key", col("base_name"))
      .localCheckpoint(true)

    val byName = org.apache.spark.sql.expressions.Window
      .partitionBy("block_key").orderBy("base_name")
    val expected = stats.withColumn("rnk", row_number().over(byName))
      .select("block_key", "base_name", "rnk")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

    val got = Matching.blockRanked(stats, parts = 8)
      .select("block_key", "base_name", "rnk")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

    assert(got == expected,
      s"diff: ${(got diff expected).take(5)} / ${(expected diff got).take(5)}")
    // ranks are 1..n per block, no gaps
    assert(got.filter(_._1 == "B_big").map(_._3) == (1 to 5000).toSet)
    assert(got.filter(_._1 == "A_small").map(_._3) == (1 to 37).toSet)
  }

  test("sortedNeighborhoodPairs is rank-path-independent") {
    import spark.implicits._
    // similar names so the window actually emits qualifying pairs
    val names = (1 to 600).map(i => (i.toLong, f"Supplier#$i%09d"))
    val derived = Normalize.withDerived(names.toDF("id", "name"), "name", "id")
    val stats = Matching.nameStats(derived).localCheckpoint(true)
    def pairsVia(f: => org.apache.spark.sql.DataFrame): Set[(String, String)] =
      f.select("a_name", "b_name").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val viaWindow = pairsVia(Matching.sortedNeighborhoodPairs(stats, window = 5))
    // force the distributed ranking by feeding blockRanked directly
    // through the same fan-out shape: equality of the rank columns
    // (test above) plus this end-to-end check on the public surface
    assert(viaWindow.nonEmpty)
    val ranked = Matching.blockRanked(stats, parts = 8)
    val viaDistributed = {
      val a = ranked.select(col("block_key"), col("base_name").as("a_name"),
        col("min_row").as("a_min_row"), col("max_row").as("a_max_row"),
        col("token_key").as("a_token_key"),
        explode(sequence(col("rnk") + 1, col("rnk") + 4)).as("rnk"))
      val b = ranked.select(col("block_key"), col("base_name").as("b_name"),
        col("min_row").as("b_min_row"), col("max_row").as("b_max_row"),
        col("token_key").as("b_token_key"), col("rnk"))
      import graft.functions.functions.jaro_winkler
      val s = DedupSettings()
      a.join(b, Seq("block_key", "rnk"))
        .withColumn("ratio", jaro_winkler(col("a_name"), col("b_name")))
        .withColumn("token_match", col("a_token_key") === col("b_token_key"))
        .where((col("token_match") && col("ratio") >= s.softThreshold) ||
          col("ratio") >= s.hardThreshold)
        .select("a_name", "b_name").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    }
    assert(viaDistributed == viaWindow)
  }
}
