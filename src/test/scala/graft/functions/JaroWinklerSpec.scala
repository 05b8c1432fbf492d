package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {
  private def jw(a: String, b: String) = JaroWinklerAlgo.compute(a, b)

  test("matches DuckDB jaro_winkler_similarity on pinned cases") {
    // every expected value captured from DuckDB (the oracle engine)
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("ABCVWXYZ", "CABVWXYZ") == 0.9583333333333334)
    assert(jw("AB", "BA") == 0.0)
    assert(jw("ABC", "CBA") == 0.5555555555555555)
    assert(jw("ABCD", "BADC") == 0.8333333333333334)
    assert(jw("X", "XX") == 0.8500000000000001)
    assert(jw("CUSTOMER 000000001", "CUSTOMER 000000002") == 0.9777777777777777)
    assert(jw("TATA CONSULTANCY SERVICES", "TATA CONSULTANCY SERVICES LIMITED")
      == 0.9515151515151515)
    assert(jw("IBM", "IBM INDIA") == 0.8444444444444443)
    assert(jw("AAAB", "AAB") == 0.9333333333333333)
    // integer transposition halving (3 mismatched positions -> t=1)
    assert(jw("ABCXXXX", "BCAXXXX") == 0.9523809523809524 ||
      // jw applies no boost here? prefix 0 chars -> boost irrelevant
      jw("ABCXXXX", "BCAXXXX") == 0.9523809523809524)
  }

  test("byte fast path agrees with string path; non-ascii falls back") {
    import org.apache.spark.unsafe.types.UTF8String
    def sim(a: String, b: String) =
      JaroWinklerAlgo.similarity(UTF8String.fromString(a), UTF8String.fromString(b))
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 1000) {
      val a = (0 until rnd.nextInt(12)).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
      val b = (0 until rnd.nextInt(12)).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
      assert(sim(a, b) == JaroWinklerAlgo.compute(a, b), s"'$a' '$b'")
    }
    // unicode goes through the string path and still behaves
    assert(sim("CAFÉ", "CAFÉ") == 1.0)
    assert(sim("MÜNCHEN", "MUNCHEN") == JaroWinklerAlgo.compute("MÜNCHEN", "MUNCHEN"))
  }

  test("properties: range, symmetry, identity") {
    val rnd = new scala.util.Random(42)
    def randStr() = {
      val n = rnd.nextInt(15)
      (0 until n).map(_ => ('A' + rnd.nextInt(4)).toChar).mkString
    }
    for (_ <- 1 to 2000) {
      val a = randStr(); val b = randStr()
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"range: '$a' '$b' -> $v")
      assert(v == jw(b, a), s"symmetry: '$a' '$b'")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"identity: '$a'")
    }
  }
}
