package graft.ext

import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private def ts(m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("bucketed range join equals the naive non-equi join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 200).map(i =>
      (i.toLong, (i % 7).toLong, ts(rnd.nextInt(50), rnd.nextInt(60))))
      .toDF("l_id", "k", "lts")
    val right = (1 to 300).map(i =>
      (i.toLong, (i % 7).toLong, ts(rnd.nextInt(50), rnd.nextInt(60))))
      .toDF("r_id", "k", "rts")
    val got = RangeJoin.rangeJoin(left, right, Seq("k"), "lts", "rts", 300L, 120L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = left.join(right, Seq("k"))
      .where(unix_timestamp(col("rts")) >= unix_timestamp(col("lts")) - 300 &&
        unix_timestamp(col("rts")) <= unix_timestamp(col("lts")) + 120)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("bounds are inclusive on both ends") {
    import spark.implicits._
    val left = Seq((1L, 0L, ts(30))).toDF("l_id", "k", "lts")
    val right = Seq(
      (10L, 0L, ts(25)),        // exactly lower bound (-300s)
      (11L, 0L, ts(32)),        // exactly upper bound (+120s)
      (12L, 0L, ts(24, 59)),    // one past lower
      (13L, 0L, ts(32, 1)))     // one past upper
      .toDF("r_id", "k", "rts")
    val got = RangeJoin.rangeJoin(left, right, Seq("k"), "lts", "rts", 300L, 120L)
      .select("r_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L))
  }
}
