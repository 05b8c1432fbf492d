package graft.sources

import graft.dedup.{Outputs, Pipeline, SparkTest}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class XlsxSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("multi-sheet write -> read round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlsx").toFile
    val path = new java.io.File(dir, "out.xlsx").getAbsolutePath
    val a = Seq(("IBM & Co <X>", 1.5, 2L), ("Tata \"T\"", -0.25, 7L))
      .toDF("name", "score", "n")
    val b = Seq(("k1", "v1")).toDF("setting", "value")
    Xlsx.write(Seq("clusters" -> a, "settings" -> b), path)

    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("name", "score", "n"))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("IBM & Co <X>", "1.5", "2"), ("Tata \"T\"", "-0.25", "7")))
  }

  test("readTyped infers pandas-style dtypes from cell types") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlsx_typed").toFile
    val path = new java.io.File(dir, "typed.xlsx").getAbsolutePath
    // "123" is a STRING cell that looks numeric - pandas keeps object
    val df = Seq(("IBM", 1.5, 2L, "123"), ("Tata", -0.25, 7L, "456"))
      .toDF("name", "score", "n", "code")
    Xlsx.write(Seq("s" -> df), path)
    val back = Xlsx.readTyped(spark, path)
    assert(back.schema.map(f => f.name -> f.dataType) == Seq(
      "name" -> StringType, "score" -> DoubleType,
      "n" -> LongType, "code" -> StringType))
    val r = back.orderBy("n").collect()
    assert(r(0).getString(0) == "IBM" && r(0).getDouble(1) == 1.5 &&
      r(0).getLong(2) == 2L && r(0).getString(3) == "123")
  }

  test("typed xlsx read keeps name detection off numeric id columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlsx_detect").toFile
    val path = new java.io.File(dir, "ids.xlsx").getAbsolutePath
    // numeric first column: pandas (the reference) types it, so the
    // first STRING column is the company name — typed read preserves
    // that; an all-string read would misdetect "id"
    Xlsx.write(Seq("s" -> Seq((1L, "IBM"), (2L, "TCS")).toDF("id", "company")), path)
    assert(Sources.detectNameColumn(Sources.readXlsx(spark, path))
      .contains("company"))
  }

  test("reference golden xlsx fixture reads and dedups correctly") {
    val ref = "/root/reference/test_input.xlsx"
    assume(new java.io.File(ref).exists())
    val df = Xlsx.read(spark, ref)
    assert(Sources.detectNameColumn(df).contains("Company Name"))
    assert(df.count() == 8)
    val withId = df.coalesce(1).withColumn("_id",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val full = Pipeline.run(withId, "Company Name", "_id")
    val mapping = Outputs.mapping(full).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mapping("TCS") == "TATA CONSULTANCY SERVICES")
    assert(mapping("IBM") == "IBM")
    assert(mapping("Ltd") == "LTD")
  }

  test("xlsx report sink: the reference's three workbooks") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlsx_reports").toFile
    val input = Seq((0L, "IBM India Pvt Ltd"), (1L, "IBM"), (2L, "Microsoft"))
      .toDF("id", "name")
    val full = Pipeline.run(input, "name", "id")
    val path = new java.io.File(dir, "company_duplicates_final.xlsx").getAbsolutePath
    Xlsx.write(Seq(
      "clusters" -> Outputs.clusters(full),
      "canonical_summary" -> Outputs.summary(full),
      "settings" -> Outputs.settingsEcho(spark, graft.dedup.DedupSettings())), path)
    val clusters = Xlsx.read(spark, path)
    assert(clusters.count() == 3)
    assert(clusters.columns.contains("canonical_name"))
  }

  test("write rejects a sheet over the row cap instead of OOMing the driver") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlsx_cap").toFile
    val path = new java.io.File(dir, "big.xlsx").getAbsolutePath
    val big = spark.range(10).toDF("id")
    // cap of 5 data rows + 1 header = 6; 10 rows must abort with the
    // sheet named in the message (real cap is MaxSheetRows = 2^20)
    val e = intercept[IllegalArgumentException] {
      Xlsx.write(Seq("huge" -> big), path, maxRows = 6L)
    }
    assert(e.getMessage.contains("huge"))
    assert(e.getMessage.contains("parquet"))
    // under the cap still writes fine through the same streaming path
    val ok = spark.range(5).toDF("id")
    Xlsx.write(Seq("ok" -> ok), path, maxRows = 6L)
    assert(Xlsx.read(spark, path).count() == 5)
  }
}
