package graft.core

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Pins the release() contract after the r21 root-only restriction
  * (ADVICE r20): destructive release happens ONLY when the frame IS
  * the checkpoint (analyzed root = LogicalRDD); a DERIVED frame over
  * a shared checkpoint must be a no-op, never an unpersist/delete of
  * the still-referenced ancestor. */
class FramesSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("release on the materialize() result drops its cached blocks") {
    import spark.implicits._
    val ck = Frames.materialize(Seq(1, 2, 3).toDF("v"), reliable = false)
    val rddId = ck.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId))
    Frames.release(ck)
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId))
  }

  test("release on a DERIVED frame leaves the shared checkpoint live") {
    import spark.implicits._
    val ck = Frames.materialize(Seq(1, 2, 3).toDF("v"), reliable = false)
    val rddId = ck.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    val derived = ck.filter(org.apache.spark.sql.functions.col("v") > 1)
    Frames.release(derived) // must be a no-op: root is Filter, not LogicalRDD
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "releasing a derived frame must not unpersist the ancestor checkpoint")
    // the ancestor is still readable (blocks intact)
    assert(derived.count() === 2)
    Frames.release(ck) // proper release still works afterwards
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId))
  }
}
