package graft.dedup

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test: the reference's 8-row fixture
  * (/root/repo/FIXTURES.md §1, engine_test.py:33-47) through the full
  * pipeline, with our deterministic re-specs (cluster_id =
  * min(row_order): 0 and 2 instead of the union-find artifacts 1/3;
  * offline — no web-verified reason suffixes). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private lazy val fullDf = {
    import spark.implicits._
    val input = Seq(
      (0L, "IBM India Pvt Ltd"),
      (1L, "IBM"),
      (2L, "TCS"),
      (3L, "Tata Consultancy Services Limited"),
      (4L, "Google LLC"),
      (5L, "Alphabet Inc"),
      (6L, "Microsoft"),
      (7L, "Ltd")).toDF("id", "company_name")
    Pipeline.run(input, "company_name", "id").cache()
  }

  private lazy val full = Outputs.clusters(fullDf).collect()

  test("golden clusters sheet") {
    val expected = Seq(
      Row(0L, "IBM India Pvt Ltd", "IBM INDIA PVT LTD", "IBM", 0L, 2L, "IBM",
        0.98, "token-sorted match AND ratio >= 0.90"),
      Row(1L, "IBM", "IBM", "IBM", 0L, 2L, "IBM", 0.70, "Isolated or weak match"),
      Row(2L, "TCS", "TCS", "TATA CONSULTANCY SERVICES", 2L, 2L,
        "TATA CONSULTANCY SERVICES", 0.98, "token-sorted match AND ratio >= 0.90"),
      Row(3L, "Tata Consultancy Services Limited", "TATA CONSULTANCY SERVICES LIMITED",
        "TATA CONSULTANCY SERVICES", 2L, 2L, "TATA CONSULTANCY SERVICES", 0.70,
        "Isolated or weak match"),
      Row(4L, "Google LLC", "GOOGLE LLC", "GOOGLE", 4L, 1L, "GOOGLE", 0.70,
        "Isolated or weak match"),
      Row(5L, "Alphabet Inc", "ALPHABET INC", "ALPHABET", 5L, 1L, "ALPHABET", 0.70,
        "Isolated or weak match"),
      Row(6L, "Microsoft", "MICROSOFT", "MICROSOFT", 6L, 1L, "MICROSOFT", 0.70,
        "Isolated or weak match"),
      Row(7L, "Ltd", "LTD", "", 7L, 1L, "LTD", 0.50,
        "No base name after cleaning; kept as singleton"))
    assert(full.toSeq == expected)
  }

  test("typed Dataset facade carries the contract") {
    import spark.implicits._
    val recs = Pipeline.runTyped(
      Seq((0L, "IBM"), (1L, "IBM")).toDF("id", "n"), "n", "id")
      .collect().sortBy(_.row_order)
    assert(recs.map(_.canonical_name).toSeq == Seq("IBM", "IBM"))
    assert(recs.map(_.cluster_size).toSeq == Seq(2L, 2L))
    assert(recs(0).confidence == 0.98 && recs(1).confidence == 0.70)
  }

  test("stats match the reference fixture") {
    val s = Outputs.stats(fullDf).collect()(0)
    assert(s.getLong(0) == 8) // total_rows
    assert(s.getLong(1) == 6) // total_clusters
    assert(s.getLong(2) == 4) // rows in multi-record clusters
    assert(s.getLong(3) == 2) // review rows
  }

  test("summary and review match the reference fixture") {
    val summary = Outputs.summary(fullDf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(summary == Seq(
      (0L, "IBM", 2L), (2L, "TATA CONSULTANCY SERVICES", 2L), (4L, "GOOGLE", 1L),
      (5L, "ALPHABET", 1L), (6L, "MICROSOFT", 1L), (7L, "LTD", 1L)))
    val review = Outputs.review(fullDf).collect().map(_.getLong(0)).toSeq
    assert(review == Seq(0L, 2L))
  }

  test("driver fast path and distributed path agree bit-for-bit") {
    import spark.implicits._
    // 60 names engineered for near-dup structure: shared stems with
    // typos (soft/hard matches), duplicated rows, empty names, and
    // multi-block spread
    val stems = Seq("GLOBEX CORP", "GLOBEX CORPS", "INITECH LTD", "INITECH INC",
      "ACME WIDGETS", "ACME WIDGET", "UMBRELLA PHARMA", "UMBRELA PHARMA",
      "STARK INDUSTRIES", "STARK INDUSTRIE", "WAYNE ENTERPRISES", "")
    val rows = (0 until 60).map { i =>
      (i.toLong, stems(i % stems.length) + (if (i % 5 == 0) "" else s" ${i % 3}"))
    }
    val df = rows.toDF("id", "nm")
    val fast = Pipeline.run(df, "nm", "id").orderBy("row_order").collect()
    val dist = Pipeline.run(df, "nm", "id",
      DedupSettings(driverFastPathNames = 0L)).orderBy("row_order").collect()
    assert(fast.length == 60 && fast.toSeq == dist.toSeq)
  }
}
