package graft.ext

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")

  test("asof semantics: latest right <= left, ties included, no-match null") {
    import spark.implicits._
    val left = Seq((1L, ts(5), "a"), (1L, ts(10), "b"), (1L, ts(2), "early"),
      (2L, ts(7), "c"), (3L, ts(9), "nomatch"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, ts(3), 30.0), (1L, ts(10), 100.0), (1L, ts(11), 110.0),
      (2L, ts(1), 10.0))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("name"), r.getAs[Any]("asof_v")))
    assert(got.toSeq == Seq(
      (1L, "early", null),      // before any right row
      (1L, "a", 30.0),          // latest right at/before 10:05 is 10:03
      (1L, "b", 100.0),         // tie at 10:10 counts (>= semantics)
      (2L, "c", 10.0),
      (3L, "nomatch", null)))   // key with no right rows
  }

  test("most recent right row wins even when its value is null (native ASOF)") {
    import spark.implicits._
    val left = Seq((1L, ts(5), "probe")).toDF("k", "ts", "name")
    // latest right row before 10:05 is 10:04 with a NULL value — the
    // join must honor it, not skip back to 10:02's 20.0
    val right = Seq((1L, ts(2), Some(20.0)), (1L, ts(4), Option.empty[Double]))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("v")).collect()
    assert(got.length == 1 && got(0).getAs[Any]("asof_v") == null)
  }
}
