package graft.sources

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    s"$d/$name"
  }

  /** Run `f` with broadcast joins disabled (forces the shuffle-or-not
    * question to matter), returning the FINAL adaptive plan string. */
  private def finalPlan(f: => org.apache.spark.sql.DataFrame): String = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val df = f
      df.collect() // AQE finalizes the physical plan on execution
      df.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val tables: Unit = {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, s"name_$i")).toDF("k", "name")
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "score")
    Bucketed.write(left, "bkt_left", tmp("bkt_left"), 8, Seq("k"))
    Bucketed.write(right, "bkt_right", tmp("bkt_right"), 8, Seq("k"))
  }

  test("co-bucketed tables join without an Exchange on either side") {
    tables
    val plan = finalPlan {
      Bucketed.read(spark, "bkt_left").join(Bucketed.read(spark, "bkt_right"), "k")
    }
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
  }

  test("equality predicates on the bucket key prune to one bucket") {
    tables
    // autoBucketedScan turns bucketing off for scans with no
    // join/agg to feed (favoring split parallelism) — which also
    // forfeits pruning; pin it on for the point-lookup pattern
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, false)
      val df = Bucketed.read(spark, "bkt_left").where("k = 42")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // a point lookup reads 1/8 of the files — at 100 TB this is the
      // difference between a full scan and one bucket's worth
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning in:\n$plan")
    } finally spark.conf.set(conf, prev)
  }

  test("row contents round-trip through the bucketed layout") {
    tables
    val out = Bucketed.read(spark, "bkt_left")
      .join(Bucketed.read(spark, "bkt_right"), "k")
      .selectExpr("k", "name", "score").orderBy("k").collect()
    assert(out.length == 1000)
    assert(out(41).getLong(0) == 42L)
    assert(out(41).getString(1) == "name_42")
    assert(out(41).getDouble(2) == 84.0)
  }
}
