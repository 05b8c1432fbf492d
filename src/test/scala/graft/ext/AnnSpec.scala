package graft.ext

import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private lazy val emb = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0L until 60L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  test("brute force matches a hand-rolled cosine on known vectors") {
    import spark.implicits._
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 1.0f), 0), (3L, Array(-1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val p = Ann.prepared(tiny)
    val got = Ann.bruteForceTopK(p.filter(col("vec_id") === 0), p, 3)
      .orderBy("rk").collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    // cos(e0, e2)=0.707107, cos(e0, e1)=0, cos(e0, e3)=-1
    assert(got == Seq((2L, 0.707107), (1L, 0.0), (3L, -1.0)))
  }

  test("IVF with full probe equals brute force") {
    val p = Ann.prepared(emb).cache()
    val q = p.filter(col("vec_id") % 10 === 0)
    val bf = Ann.bruteForceTopK(q, p, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ivf = Ann.ivfSearch(emb, q, nProbe = 4, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ivf == bf && bf.nonEmpty)
  }

  test("IVF with partial probe returns k results from probed buckets only") {
    val p = Ann.prepared(emb)
    val q = p.filter(col("vec_id") === 0)
    val res = Ann.ivfSearch(emb, q, nProbe = 2, k = 4).collect()
    assert(res.length == 4)
    val labels = res.map(_.getLong(2) % 4).toSet
    assert(labels.size <= 2) // neighbors come from at most 2 buckets
  }

  test("salted LSH pair join: correct and balanced on a single dominant bucket") {
    import spark.implicits._
    // adversarial skew: 120 near-identical vectors -> ONE sign bucket
    val rnd = new scala.util.Random(5)
    val skewed = (0L until 120L).map { i =>
      (i, Array.tabulate(8)(d => 1.0f + rnd.nextFloat() * 0.01f), 0)
    }.toDF("vec_id", "embedding", "label")
    val p = Ann.prepared(skewed).cache()
    val planes = Ann.hyperplanes(4, 8)

    // ground truth: brute-force pairs within the same bucket
    val b = p.withColumn("bucket", Ann.lshBucket(col("v"), planes))
    val naive = b.as("a").join(b.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", Ann.cosine(col("a.u"), col("b.u")))
      .filter(col("cos") >= 0.5)
      .select(col("a.vec_id"), col("b.vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.size == 120 * 119 / 2) // all in one bucket, all similar

    for (salt <- Seq(1, 4, 16)) {
      val got = Ann.lshPairs(p, planes, minCos = 0.5, salt = salt)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"salt=$salt")
    }

    // balance: with salt=4 the pair generation spreads across chunks —
    // no (bucket, chunk) join group holds more than ~2x the mean.
    // Reconstruct the per-chunk pair counts the join produces.
    val salt = 4
    val chunks = p.withColumn("bucket", Ann.lshBucket(col("v"), planes))
      .withColumn("chunk", pmod(hash(col("vec_id")), lit(salt)))
      .groupBy("chunk").count().collect()
      .map(r => r.getLong(1)).sorted
    val perGroup = (0 until salt).flatMap { lo =>
      (lo until salt).map { hi =>
        val nLo = chunks(lo); val nHi = chunks(hi)
        if (lo == hi) nLo * (nLo - 1) / 2 else nLo * nHi
      }
    }
    val mean = perGroup.sum.toDouble / perGroup.size
    assert(perGroup.max <= 2 * mean,
      s"skewed pair groups: $perGroup (mean $mean)")
  }

  test("zero-norm vectors normalize to zero instead of failing the job") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(3.0f, 0.0f, 4.0f), 0)).toDF("vec_id", "embedding", "label")
    val p = Ann.prepared(df).orderBy("vec_id").collect()
    // ANSI mode raises on x/0 — the zero vector must survive as 0⃗
    assert(p(0).getSeq[Double](3) == Seq(0.0, 0.0, 0.0))
    assert(p(1).getSeq[Double](3) == Seq(0.6, 0.0, 0.8))
    // and it can never clear a similarity threshold
    val pairs = Ann.lshPairs(Ann.prepared(df), Ann.hyperplanes(4, 3), minCos = 0.1)
    assert(pairs.count() == 0)
  }
}
