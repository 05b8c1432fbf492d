package graft.queries

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

class GopherDsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  // ------------------------------------------------------------ gopher

  private def gopher(texts: (Long, String)*): Map[Long, Map[String, Any]] = {
    import spark.implicits._
    val df = TextQueries.gopherRules(texts.toDF("doc_id", "text"))
    df.collect().map { r =>
      r.getLong(0) -> df.columns.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    }.toMap
  }

  private val goodText: String =
    Seq.fill(12)("the quick brown fox jumps with grace").mkString(" ") // 84 words

  test("a clean prose doc passes every rule") {
    val r = gopher(1L -> goodText)(1L)
    assert(r("keep") == true, r)
    assert(r("n_words") == 84L)
  }

  test("word-count bounds: a short doc fails words_ok only") {
    val r = gopher(1L -> "the cat sat with me and that have be of")(1L)
    assert(r("words_ok") == false && r("keep") == false)
    assert(r("stop_ok") == true && r("alpha_ok") == true)
  }

  test("mean word length out of [3,10] fails mean_len_ok") {
    val r = gopher(1L -> Seq.fill(60)("a b").mkString(" "))(1L)
    assert(r("mean_len_ok") == false)
    val long = gopher(2L -> Seq.fill(55)("incomprehensibilities").mkString(" "))(2L)
    assert(long("mean_len_ok") == false)
  }

  test("symbol ratio: hash-spam fails symbol_ok") {
    val r = gopher(1L -> Seq.fill(60)("# tag").mkString(" "))(1L)
    assert(r("symbol_ok") == false)
  }

  test("bullet-heavy docs fail bullet_ok; ellipsis-heavy fail ellipsis_ok") {
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    assert(gopher(1L -> bullets)(1L)("bullet_ok") == false)
    val ellip = (1 to 10).map(i => s"teaser number $i...").mkString("\n")
    assert(gopher(2L -> ellip)(2L)("ellipsis_ok") == false)
    // one bullet in ten lines is fine
    val mixed = ("- intro" +: (1 to 9).map(i => s"plain line $i")).mkString("\n")
    assert(gopher(3L -> mixed)(3L)("bullet_ok") == true)
  }

  test("numeric noise fails alpha_ok; missing stopwords fail stop_ok") {
    val nums = gopher(1L -> (1 to 60).map(_.toString).mkString(" "))(1L)
    assert(nums("alpha_ok") == false && nums("stop_ok") == false)
  }

  test("empty text is guarded, not an ANSI division error") {
    val r = gopher(1L -> "")(1L)
    assert(r("keep") == false)
  }

  // ------------------------------------------------------------ dsir

  private def dsir(rows: (Long, String, String)*) = {
    import spark.implicits._
    TextQueries.dsirWeights(rows.toDF("doc_id", "text", "lang"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
  }

  test("feature count is 2w-1 hashed uni+bigrams per doc") {
    val got = dsir((1L, "one two three four", "en"), (2L, "solo", "de"))
    assert(got(1L)._1 == 7L) // 4 unigrams + 3 bigrams
    assert(got(2L)._1 == 1L)
  }

  test("docs made of target-language grams outscore off-target docs") {
    val en = (1L to 8L).map(i => (i, "hello world we meet again", "en"))
    val de = (9L to 16L).map(i => (i, "guten tag wir treffen uns", "de"))
    val got = dsir(en ++ de: _*)
    val enW = got(1L)._2.get
    val deW = got(9L)._2.get
    assert(enW > deW, s"en=$enW de=$deW")
  }

  test("weights are deterministic across reruns and input order") {
    val rows = Seq(
      (1L, "alpha beta gamma", "en"), (2L, "beta gamma delta", "de"),
      (3L, "gamma delta epsilon", "en"))
    assert(dsir(rows: _*) == dsir(rows.reverse: _*))
  }
}
