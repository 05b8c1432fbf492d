package graft.queries

import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior the sf0.01 oracle can't exercise (the driver corpus has
  * no exact duplicates or degenerate docs): the exact-dedup pre-pass
  * inside `text_neardup_clusters` must collapse identical texts into
  * their representative's cluster, and shingle-less docs must stay
  * singletons even when their content is identical — both exactly as
  * the all-pairs LSH semantics would leave them. */
class NearDupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ndc_fixture")
    dir.toFile.deleteOnExit()
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  private val story = "the quick brown fox jumps over the lazy dog near the river bank today"

  test("exact duplicates join their representative's near-dup cluster") {
    val dir = writeDocs(Seq(
      1L -> story,
      2L -> story, // exact copy of 1 — collapsed by the pre-pass
      3L -> (story + " again"), // near-dup of 1 — found by LSH
      4L -> "completely unrelated text with different vocabulary and no overlap whatsoever here"))
    val out = TextQueries.queries("text_neardup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 4L)
  }

  test("identical shingle-less docs stay singletons (all-pairs parity)") {
    val dir = writeDocs(Seq(
      10L -> "short", // < ShingleK words: no shingles, no LSH bands
      11L -> "short",
      12L -> story))
    val out = TextQueries.queries("text_neardup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(10L) == (10L, true))
    assert(out(11L) == (11L, true)) // NOT collapsed into 10
    assert(out(12L) == (12L, true))
  }
}
