package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

/** DedupSettings.parseAddMap vs the reference's text syntax
  * (app.py:44-52), including its malformed-entry semantics. */
class AddMapSpec extends AnyFunSuite {

  test("the reference UI's own example string") {
    // the placeholder text shown in the reference's sidebar (app.py:44)
    assert(DedupSettings.parseAddMap("GE->GENERAL ELECTRIC; P&G->PROCTER & GAMBLE") ===
      Map("GE" -> "GENERAL ELECTRIC", "P&G" -> "PROCTER & GAMBLE"))
  }

  test("trim + upper-case on both sides") {
    assert(DedupSettings.parseAddMap("  ge ->  general electric ") ===
      Map("GE" -> "GENERAL ELECTRIC"))
  }

  test("empty and arrow-less entries are skipped silently") {
    assert(DedupSettings.parseAddMap("") === Map.empty)
    assert(DedupSettings.parseAddMap(";;") === Map.empty)
    assert(DedupSettings.parseAddMap("no arrow here; GE->GENERAL ELECTRIC") ===
      Map("GE" -> "GENERAL ELECTRIC"))
  }

  test("an entry with two arrows is skipped (len(split) != 2, app.py:48-49)") {
    assert(DedupSettings.parseAddMap("A->B->C; GE->GENERAL ELECTRIC") ===
      Map("GE" -> "GENERAL ELECTRIC"))
  }

  test("empty key/value sides are kept, matching Python") {
    // "A->" splits to ["A", ""] — two parts, so Python keeps it
    assert(DedupSettings.parseAddMap("A->") === Map("A" -> ""))
    assert(DedupSettings.parseAddMap("->B") === Map("" -> "B"))
  }

  test("later duplicate key wins (dict overwrite)") {
    assert(DedupSettings.parseAddMap("GE->FIRST; GE->SECOND") ===
      Map("GE" -> "SECOND"))
  }

  test("parsed map feeds acronymMap with user precedence over defaults") {
    val s = DedupSettings(addMap = DedupSettings.parseAddMap("TCS->OVERRIDDEN"))
    assert(s.acronymMap("TCS") === "OVERRIDDEN")
    assert(s.acronymMap("HDFC") === "HDFC BANK") // default untouched
  }

  test("null degrades to empty (library-facing defensiveness)") {
    assert(DedupSettings.parseAddMap(null) === Map.empty)
  }
}
