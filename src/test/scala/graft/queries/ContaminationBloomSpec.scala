package graft.queries

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom-prefiltered decontamination path must be OUTPUT-IDENTICAL
  * to the exact semi-join it accelerates: the Bloom filter may pass
  * false positives into the verify join (harmless) but must never
  * produce a false negative (a missed contaminated doc). Checked on
  * the real driver corpus, where the md5 split assigns ~5% of docs to
  * the test split. */
class ContaminationBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloom-prefiltered contamination equals the exact semi-join") {
    val exact = TextQueries.queries("text_contamination")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val bloom = TextQueries.queries("text_contamination_bloom")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(exact.nonEmpty, "fixture must actually contain contamination")
    assert(bloom == exact)
  }

  test("bloom filter accepts every inserted gram (no false negatives by construction)") {
    // Direct property: a Bloom filter over a set claims membership for
    // every member. Pin it on a small explicit set through the same
    // DataFrameStatFunctions API the query uses.
    val s = spark
    import s.implicits._
    val df = (1 to 10000).map(i => s"gram $i").toDF("g")
    val bf = df.stat.bloomFilter("g", 10000, 0.01)
    assert((1 to 10000).forall(i => bf.mightContainString(s"gram $i")))
  }
}
