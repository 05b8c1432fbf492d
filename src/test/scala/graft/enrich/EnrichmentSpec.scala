package graft.enrich

import graft.dedup.{Pipeline, SparkTest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EnrichmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  /** A canned "web" verifier standing in for the DDG/Gemini paths. */
  private object CannedVerifier extends Verifier {
    override def verifyName(name: String): Option[String] =
      if (name.startsWith("GOOGLE")) Some("ALPHABET INC.") else None
    override def findDomain(name: String): String =
      if (name == "MICROSOFT") "microsoft.com" else ""
    override def classifyIndustry(name: String): String =
      OfflineVerifier.classifyIndustry(name)
    override def research(name: String): Option[(String, String)] = None
  }

  private lazy val full = {
    import spark.implicits._
    implicit val sp = spark
    Pipeline.run(Seq(
      (0L, "Google LLC"), (1L, "Microsoft"), (2L, "First National Bank Ltd"))
      .toDF("id", "name"), "name", "id")
  }

  test("web verification annotates low-confidence clusters only, never reclusters") {
    implicit val sp = spark
    val out = Enrichment.webVerify(full, CannedVerifier)
      .orderBy("row_order").collect()
    // GOOGLE rep verified to a different name -> annotated
    assert(out(0).getAs[String]("web_canonical") == "ALPHABET INC.")
    // MICROSOFT verifier abstains -> null
    assert(out(1).getAs[String]("web_canonical") == null)
    // clustering untouched
    assert(out.map(_.getAs[Long]("cluster_id")).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getAs[String]("canonical_name")).toSeq ==
      Seq("GOOGLE", "MICROSOFT", "FIRST NATIONAL BANK"))
  }

  test("enrichment joins website + rule-based industry per canonical name") {
    implicit val sp = spark
    val out = Enrichment.enrich(full, CannedVerifier)
      .orderBy("row_order").collect()
    assert(out(1).getAs[String]("website") == "microsoft.com")
    assert(out(2).getAs[String]("industry") == "FINANCE") // BANK keyword
    assert(out(0).getAs[String]("industry") == "Diversified/Other")
  }

  test("offline research: layered acronym + suffix/country rules") {
    // 1. direct acronym hit
    assert(OfflineVerifier.research("tcs") ===
      Some(("TATA CONSULTANCY SERVICES", "acronym expansion of tcs")))
    // 2. suffix + country canonicalization
    assert(OfflineVerifier.research("ACME COMPONENTS PVT LTD INDIA") ===
      Some(("ACME COMPONENTS", "legal-suffix/country canonicalization")))
    // 3. acronym re-check after the strip
    assert(OfflineVerifier.research("TCS LTD") ===
      Some(("TATA CONSULTANCY SERVICES",
        "acronym expansion of canonical base TCS")))
    // abstains when no rule applies, or on strip-to-empty
    assert(OfflineVerifier.research("UNKNOWN NAME") === None)
    assert(OfflineVerifier.research("LTD") === None)
    assert(OfflineVerifier.research("  ") === None)
  }
}
