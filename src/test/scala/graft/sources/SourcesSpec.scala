package graft.sources

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** E2-style end-to-end: CSV in → auto-detected column → pipeline →
  * five report sinks on disk (the reference's engine_test.py flow,
  * offline). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("csv in, reports out, column auto-detection") {
    val dir = Files.createTempDirectory("graft_src").toFile
    val csv = new java.io.File(dir, "companies.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("Company Name")
    Seq("IBM India Pvt Ltd", "IBM", "TCS", "Tata Consultancy Services Limited",
      "Google LLC", "Alphabet Inc", "Microsoft", "Ltd").foreach(w.println)
    w.close()

    val df = Sources.readCsv(spark, csv.getAbsolutePath)
    assert(Sources.detectNameColumn(df).contains("Company Name"))
    assert(Sources.peekSchema(spark, csv.getAbsolutePath).fields.length == 1)

    val out = new java.io.File(dir, "out").getAbsolutePath
    val full = Sources.runFile(spark, csv.getAbsolutePath, out)
    assert(full.count() == 8)

    val clusters = spark.read.parquet(s"$out/company_duplicates_final")
    assert(clusters.count() == 8)
    val mapping = spark.read.parquet(s"$out/golden_mapping").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mapping("TCS") == "TATA CONSULTANCY SERVICES")
    assert(mapping("IBM India Pvt Ltd") == "IBM")
    val review = spark.read.parquet(s"$out/high_confidence_review")
    assert(review.count() == 2)
  }

  test("xlsx report format reproduces the reference's three workbooks") {
    val dir = Files.createTempDirectory("graft_xlsx_e2e").toFile
    val csv = new java.io.File(dir, "c.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("Company Name"); Seq("IBM India Pvt Ltd", "IBM", "Ltd").foreach(w.println)
    w.close()
    val out = new java.io.File(dir, "out").getAbsolutePath
    Sources.runFile(spark, csv.getAbsolutePath, out, format = "xlsx")
    for (f <- Seq("company_duplicates_final.xlsx", "golden_mapping.xlsx",
        "high_confidence_review.xlsx")) {
      assert(new java.io.File(out, f).exists(), f)
    }
    val mapping = Xlsx.read(spark, s"$out/golden_mapping.xlsx").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mapping("IBM India Pvt Ltd") == "IBM")
    assert(mapping("Ltd") == "LTD")
  }

  test("jsonl write -> read round-trip, schema-pinned and inferred") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toFile
    val path = new java.io.File(dir, "docs.jsonl").getAbsolutePath
    val df = Seq((0L, "alpha beta", "en"), (1L, "gamma", "es"))
      .toDF("doc_id", "text", "lang")
    Sources.writeJsonl(df, path)
    // inferred
    val back = Sources.readJsonl(spark, path)
      .select("doc_id", "text", "lang").orderBy("doc_id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((0L, "alpha beta", "en"), (1L, "gamma", "es")))
    // schema-pinned (single-pass at scale) + extension dispatch
    val pinned = Sources.read(spark, path)
    assert(pinned.count() == 2)
    val typed = Sources.readJsonl(spark, path, Some(df.schema))
    // JSON columns are always nullable on read — compare names+types
    assert(typed.schema.map(f => f.name -> f.dataType) ==
      df.schema.map(f => f.name -> f.dataType))
  }

  test("SQL surface: registered jaro_winkler and dot_product") {
    graft.Graft.install(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('IBM', 'IBM INDIA') AS jw, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp").collect()(0)
    assert(r.getDouble(0) == 0.8444444444444443)
    assert(r.getDouble(1) == 11.0)
  }
}
