package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTest {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  /** Evaluate the (normalized, base, block_key) triple for one name. */
  private def derive(name: String, settings: DedupSettings = DedupSettings())
      : (String, String, String) = {
    import spark.implicits._
    val df = Seq(name).toDF("name")
      .withColumn("norm", Normalize.normalizeName(col("name")))
      .withColumn("base", Normalize.baseName(col("norm"), settings))
      .withColumn("bk", Normalize.blockKey(col("base")))
    val r = df.select("norm", "base", "bk").head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  // Reference fixture semantics, /root/repo/FIXTURES.md §1 +
  // engine.py:43-70,185-200.
  test("golden fixture derivations") {
    assert(derive("IBM India Pvt Ltd") == ("IBM INDIA PVT LTD", "IBM", "I_0_IBM"))
    assert(derive("IBM") == ("IBM", "IBM", "I_0_IBM"))
    assert(derive("TCS") == ("TCS", "TATA CONSULTANCY SERVICES", "T_5_TATA"))
    assert(derive("Tata Consultancy Services Limited") ==
      ("TATA CONSULTANCY SERVICES LIMITED", "TATA CONSULTANCY SERVICES", "T_5_TATA"))
    assert(derive("Google LLC") == ("GOOGLE LLC", "GOOGLE", "G_1_GOOGLE"))
    assert(derive("Alphabet Inc") == ("ALPHABET INC", "ALPHABET", "A_1_ALPHABET"))
    assert(derive("Microsoft") == ("MICROSOFT", "MICROSOFT", "M_1_MICROSOFT"))
    assert(derive("Ltd") == ("LTD", "", "NONE"))
  }

  test("normalize: punctuation to space, keep &/- , collapse, trim") {
    assert(derive("  Foo,  Bar & Baz-Co./Inc!! ")._1 == "FOO BAR & BAZ-CO /INC")
    assert(derive("")._1 == "")
  }

  test("suffix stripping is end-anchored, longest-first, to fixpoint") {
    // stacked suffixes strip one at a time to a fixpoint
    assert(derive("Xyz Co Pvt Ltd")._2 == "XYZ")
    // PRIVATE LIMITED must strip as a unit, not leave "... PRIVATE"
    assert(derive("Acme Private Limited")._2 == "ACME")
    // mid-string suffix tokens survive (end-anchored only)
    assert(derive("Ltd Services")._2 == "LTD SERVICES")
    // dotted variants are dead code: dots normalize to spaces first,
    // and "B V" is not an effective suffix (SURVEY.md Appendix A.4)
    assert(derive("Acme B.V.")._2 == "ACME B V")
  }

  test("country folding is end-anchored and after suffix strip") {
    assert(derive("Acme India")._2 == "ACME")
    assert(derive("Acme United Kingdom")._2 == "ACME")
    // suffixes strip first, then countries — but NOT re-interleaved:
    // "X Ltd India" -> suffix pass can't reach LTD (INDIA trails), then
    // country pass strips INDIA leaving "X LTD" (engine.py:185-192)
    assert(derive("Xyz Ltd India")._2 == "XYZ LTD")
    // disabled folding keeps the country token
    assert(derive("Acme India", DedupSettings(noSubsidiaryFold = true))._2 == "ACME INDIA")
  }

  test("acronym map: defaults + user overrides") {
    assert(derive("HDFC")._2 == "HDFC BANK")
    assert(derive("Foo", DedupSettings(addMap = Map("FOO" -> "FOOBAR")))._2 == "FOOBAR")
    // IBM INDIA mapping is reachable only with folding disabled
    assert(derive("IBM India", DedupSettings(noSubsidiaryFold = true))._2 == "IBM")
  }

  test("block key shape") {
    // first char + len//5 + first token
    assert(derive("Tata Consultancy Services Limited")._3 == "T_5_TATA")
    assert(derive("Microsoft Corporation Worldwide")._3.startsWith("M_"))
  }

  test("non-ASCII: (?U)\\w keeps accented, CJK and combining-mark word chars") {
    // The reference's Python re \w is Unicode-aware; (?U) replicates
    // it (expected values verified under CPython:
    // re.sub(r'[^\w\s&/-]', ' ', name.upper())).
    assert(derive("Caf\u00e9 GmbH") ==
      ("CAF\u00c9 GMBH", "CAF\u00c9", "C_0_CAF\u00c9"))
    // CJK has no case mapping; the name survives normalization whole
    // (6 code points -> length bucket 1, first token = whole name)
    assert(derive("\u682a\u5f0f\u4f1a\u793e\u30c8\u30e8\u30bf") ==
      ("\u682a\u5f0f\u4f1a\u793e\u30c8\u30e8\u30bf",
        "\u682a\u5f0f\u4f1a\u793e\u30c8\u30e8\u30bf",
        "\u682a_1_\u682a\u5f0f\u4f1a\u793e\u30c8\u30e8\u30bf"))
    // combining marks are word chars (\p{Mn} is inside (?U)\w), and
    // the engine does NOT canonical-normalize: decomposed e+\u0301 is
    // a DIFFERENT name than composed \u00e9 (fold spellings upstream
    // with unicode_norm('nfc') when a corpus mixes them)
    assert(derive("Cafe\u0301 Ltd")._2 == "CAFE\u0301")
    assert(derive("Cafe\u0301 Ltd")._2 != derive("Caf\u00e9 Ltd")._2)
    // DIALECT NOTE (SURVEY.md "Known risks"): the DuckDB twins' RE2
    // \w is ASCII-only — there 'E\u0301' loses the mark, '\u00c9'
    // becomes a space, and CJK names collapse to '' / block "NONE".
    // Parity on the oracle testdata holds because the generated names
    // are ASCII; non-ASCII correctness is pinned HERE, on the
    // reference-faithful side, and the differential fuzzer keeps its
    // name alphabet ASCII for the same reason (tools/fuzz.py).
  }
}
