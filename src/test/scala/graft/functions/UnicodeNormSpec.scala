package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class UnicodeNormSpec extends AnyFunSuite {
  private def norm(s: String, mode: String) =
    UnicodeNormAlgo.normalize(UTF8String.fromString(s), UTF8String.fromString(mode)).toString

  test("accent folding matches DuckDB strip_accents pinned values") {
    assert(norm("café", "strip_accents") == "cafe")
    assert(norm("Müßige Größe", "strip_accents") == "Mußige Große")
    assert(norm("ASCII only", "strip_accents") == "ASCII only")
  }

  test("nfc recomposes decomposed sequences") {
    val decomposed = "é" // e + combining acute
    assert(norm(decomposed, "nfc") == "é")
    assert(norm("é", "nfd") == "é")
    assert(norm(decomposed, "strip_accents") == "e")
  }

  test("nfkc folds compatibility forms") {
    assert(norm("ﬁle", "nfkc") == "file") // ﬁ ligature
  }
}
