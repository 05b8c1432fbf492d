package graft.queries

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Pins the hot-bucket governor on the LSH band join (the DEFAULT
  * `text_lsh_pairs`): dropping over-cap band buckets must
  * only REMOVE candidate pairs (never invent them), must actually
  * fire on the sf0.01 corpus (max bucket 7 > cap 5), and must not
  * add an Exchange — the count window rides the self-join's own
  * (band, key) shuffle. */
class LshGovernorSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val sfDir = "/root/testdata/sf0.01"

  private def pairs(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("governed pairs are a strict subset of the ungoverned surface") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val gov = pairs("text_lsh_pairs")
    val all = pairs("text_lsh_pairs_allpairs")
    assert(gov.subsetOf(all),
      s"governor invented pairs: ${(gov -- all).take(5)}")
    assert(gov.size < all.size,
      s"cap never fired at sf0.01 (gov=${gov.size}, all=${all.size})")
  }

  test("the count-window governor adds no Exchange to the band join") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    def exchanges(name: String): Int = {
      val p = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      p.linesIterator.count(_.trim.startsWith("+- Exchange")) +
        p.linesIterator.count(_.trim.startsWith("Exchange"))
    }
    assert(exchanges("text_lsh_pairs") <= exchanges("text_lsh_pairs_allpairs"),
      "governed plan shuffles more than the ungoverned one")
  }
}
