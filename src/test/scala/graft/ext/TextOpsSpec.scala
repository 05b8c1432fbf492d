package graft.ext

import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def eval1(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c(col("t")).as("r")).head().get(0)
  }

  test("shingles: k-grams, distinct, short-doc guard") {
    import spark.implicits._
    val df = Seq("a b c d", "a b a b", "x", "").toDF("t")
      .select(TextOps.shingles(TextOps.words(col("t")), 2).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b", "b c", "c d"))
    assert(got(1) == Set("a b", "b a")) // duplicates collapsed
    assert(got(2) == Set.empty) // fewer than k words
    assert(got(3) == Set.empty || got(3) == Set("")) // degenerate empty doc
  }

  test("bpeish token count") {
    // letter runs whole, digits singly, marks singly:
    // Hello + ',' + world + '4' + '2' + '!' = 6
    assert(eval1("Hello, world 42!", c => TextOps.bpeishCount(c)) == 6)
  }

  test("jaccard on arrays") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(TextOps.jaccard(col("x"), col("y")).as("j"))
    assert(df.head().getDouble(0) == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("minhash digest batching: component width and stability") {
    import spark.implicits._
    val df = Seq("w1 w2 w3 w4").toDF("t")
      .withColumn("w", TextOps.words(col("t")))
      .withColumn("sh", TextOps.shingles(col("w"), 2))
      .withColumn("d", TextOps.minhashDigests(col("sh"), 12))
    val digests = df.select("d").head().getSeq[String](0)
    assert(digests.forall(_.length == 3 * 32)) // ceil(12/4)=3 md5s
    val sigs = (0 until 12).map(i =>
      df.select(TextOps.minhashSigFromDigests(col("d"), i)).head().getString(0))
    assert(sigs.forall(_.length == 8))
    assert(sigs.distinct.size > 1) // independent components
  }
}
