package graft.core

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

class MemoSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("two sessions never cross-hit the same key") {
    import spark.implicits._
    val s2 = spark.newSession()
    val a = Memo.cached(spark, "memo-spec-x") { Seq(1).toDF("v") }
    val b = Memo.cached(s2, "memo-spec-x") {
      import s2.implicits._
      Seq(2).toDF("v")
    }
    assert(a.head().getInt(0) === 1)
    assert(b.head().getInt(0) === 2) // not spark's cached build
    Memo.invalidate(spark)
    Memo.invalidate(s2)
  }

  test("invalidate releases only the target session's entries") {
    import spark.implicits._
    val s2 = spark.newSession()
    val before = Memo.size
    Memo.cached(spark, "memo-spec-y") { Seq(1).toDF("v") }
    Memo.cached(s2, "memo-spec-y") {
      import s2.implicits._
      Seq(2).toDF("v")
    }
    assert(Memo.size === before + 2)
    Memo.invalidate(spark)
    assert(Memo.size === before + 1)
    // the surviving entry still answers from s2
    assert(Memo.cached(s2, "memo-spec-y") {
      fail("should have been cached")
    }.head().getInt(0) === 2)
    Memo.invalidate(s2)
    assert(Memo.size === before)
  }

  test("same session + key returns the memoized frame, not a rebuild") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq(1).toDF("v") }
    Memo.cached(spark, "memo-spec-z")(build)
    Memo.cached(spark, "memo-spec-z")(build)
    assert(builds === 1)
    Memo.invalidate(spark)
  }
}
