package graft.queries

import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-document behavior the driver corpus never exercises:
  * null and empty text must flow through the text suite without
  * crashing or dropping rows — a 100 TB crawl ALWAYS contains them. */
class TextRobustnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("txt_robust")
    d.toFile.deleteOnExit()
    Seq((1L, "the quick brown fox jumps over the lazy dog and runs far away to the hills today with the pack and the wind and the rain and a friend of a kind that is rare"),
      (2L, ""), (3L, null: String), (4L, "one"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", coalesce(length(col("text")), lit(0L)).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d.toString
  }

  private def run(name: String) = TextQueries.queries(name)(spark, dir)

  test("exact dedup keeps every row, null and empty texts included") {
    val out = run("text_exact_dedup").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("filter pipeline drops degenerate docs instead of crashing") {
    val out = run("text_filter_pipeline").collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out.size == 4)
    assert(out(1L)) // real prose passes
    assert(!out.getOrElse(2L, false) && !out.getOrElse(4L, false)) // too short
  }

  test("near-dup clustering emits one singleton per degenerate doc") {
    val out = run("text_neardup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 4)
    assert(out(2L) == 2L && out(3L) == 3L && out(4L) == 4L)
  }

  test("tokens and quality stay total functions over degenerate docs") {
    assert(run("text_tokens").collect().length == 4)
    assert(run("text_quality").collect().length == 4)
  }
}
