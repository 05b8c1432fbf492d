package graft.enrich

import graft.dedup.{Pipeline, SparkTest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

class HttpVerifierSpec extends AnyFunSuite {

  /** Fake transport: fails `failures` times, then answers from `f`.
    * Records every URL it was asked for. */
  private class FlakyTransport(failures: Int, f: String => String)
      extends Transport {
    val calls = mutable.ArrayBuffer.empty[String]
    override def get(url: String): String = {
      calls += url
      if (calls.size <= failures) throw new java.io.IOException("flaky")
      f(url)
    }
  }

  private def verifier(t: Transport, sleeps: mutable.ArrayBuffer[Long]) =
    new HttpVerifier(
      HttpVerifierConfig("http://svc.example", maxRetries = 2,
        initialBackoffMs = 100, minIntervalMs = 50),
      t, sleeps += _)

  test("retries with exponential backoff, then succeeds") {
    val t = new FlakyTransport(2, _ => "ALPHABET INC")
    val sleeps = mutable.ArrayBuffer.empty[Long]
    assert(verifier(t, sleeps).verifyName("GOOGLE") === Some("ALPHABET INC"))
    assert(t.calls.size === 3) // 2 failures + 1 success
    assert(t.calls.head === "http://svc.example/verify?name=GOOGLE")
    // backoffs 100, 200 are present among the recorded sleeps
    // (rate-limit waits may interleave)
    assert(sleeps.containsSlice(Seq(100L)) && sleeps.contains(200L))
  }

  test("url-encodes names") {
    val t = new FlakyTransport(0, _ => "x.com")
    val sleeps = mutable.ArrayBuffer.empty[Long]
    verifier(t, sleeps).findDomain("A&B CO")
    assert(t.calls.head === "http://svc.example/domain?name=A%26B+CO")
  }

  test("degrades to offline rules once retries are exhausted") {
    val t = new FlakyTransport(Int.MaxValue, _ => "unreached")
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val v = verifier(t, sleeps)
    assert(v.verifyName("GOOGLE") === None) // offline abstains
    assert(v.findDomain("MICROSOFT") === "") // offline: unknown
    assert(v.classifyIndustry("FIRST NATIONAL BANK") === "FINANCE") // keyword rules
    assert(v.research("tcs") ===
      Some(("TATA CONSULTANCY SERVICES", "acronym expansion of tcs")))
    assert(v.research("UNKNOWN NAME") === None)
  }

  test("empty body = abstain, not empty-string answer") {
    val t = new FlakyTransport(0, _ => "  ")
    val sleeps = mutable.ArrayBuffer.empty[Long]
    assert(verifier(t, sleeps).verifyName("GOOGLE") === None)
  }

  test("research parses official|reason") {
    val t = new FlakyTransport(0, _ => "ALPHABET INC | parent company")
    val sleeps = mutable.ArrayBuffer.empty[Long]
    assert(verifier(t, sleeps).research("GOOGLE") ===
      Some(("ALPHABET INC", "parent company")))
  }

  test("rate limit sleeps between back-to-back calls") {
    val t = new FlakyTransport(0, _ => "ok")
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val v = verifier(t, sleeps)
    v.findDomain("A"); v.findDomain("B")
    assert(sleeps.exists(s => s > 0 && s <= 50),
      s"expected a rate-limit wait <= 50ms, got $sleeps")
  }

  test("runs inside the Enrichment mapPartitions stage (serializable)") {
    val spark = SparkTest.spark
    import spark.implicits._
    implicit val sp = spark
    val full = Pipeline.run(
      Seq((0L, "Google LLC"), (1L, "Microsoft"))
        .toDF("id", "name"), "name", "id")
    // deterministic serializable transport; service knows GOOGLE only
    val svc = new Transport {
      override def get(url: String): String =
        if (url.contains("GOOGLE")) "ALPHABET INC" else ""
    }
    val v = new HttpVerifier(
      HttpVerifierConfig("http://svc.example", minIntervalMs = 0), svc)
    val out = Enrichment.webVerify(full, v).orderBy("row_order").collect()
    assert(out(0).getAs[String]("web_canonical") === "ALPHABET INC")
    assert(out(1).getAs[String]("web_canonical") === null)
  }
}
