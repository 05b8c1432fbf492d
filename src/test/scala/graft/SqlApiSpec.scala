package graft

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL surface: registered graft functions + temp views
  * let a SQL-only user run the matching stage with spark.sql. */
class SqlApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("blocking + matching expressed in pure SQL") {
    import spark.implicits._
    Graft.install(spark)
    Seq("IBM", "IBM INDIA", "MICROSOFT", "MICROSUFT", "ACME CORP")
      .toDF("base_name").createOrReplaceTempView("names")
    val out = spark.sql(
      """SELECT a.base_name AS a_name, b.base_name AS b_name,
        |       round(jaro_winkler(a.base_name, b.base_name), 4) AS ratio
        |FROM names a JOIN names b ON a.base_name < b.base_name
        |WHERE jaro_winkler(a.base_name, b.base_name) >= 0.90
        |ORDER BY a_name, b_name""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("MICROSOFT", "MICROSUFT", 0.9556)))

    val dp = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(1.0d, 1.0d, 1.0d))")
      .collect()(0).getDouble(0)
    assert(dp == 6.0)
  }
}
