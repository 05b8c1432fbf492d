package graft.queries

import graft.dedup.SparkTest
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins the exact duplicated-span machinery (text_span_dupes /
  * text_span_dedup, the substring-level dedup of Lee et al. 2022)
  * on a constructed micro corpus where every maximal span and every
  * canonical election is known by hand. SpanL = 8 tokens. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  /** n distinct tokens tagged so sequences never collide by accident. */
  private def toks(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  private def occ(df: DataFrame): Seq[(Long, Int, Boolean)] =
    TextQueries.dupSpanOccurrences(df).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue, r.getBoolean(2))).toSeq.sorted

  test("a copied 12-token region yields one maximal span per occurrence") {
    import spark.implicits._
    // doc 1 holds region A (12 tokens) at position 4; doc 2 holds the
    // same region at position 0. 12 tokens = 5 overlapping 8-windows
    // (starts +0..+4) that must merge into ONE span of 12 tokens.
    val a = toks("a", 12)
    val df = Seq(
      (1L, toks("u", 4) + " " + a + " " + toks("v", 6)),
      (2L, a + " " + toks("w", 9))).toDF("doc_id", "text")
    val got = occ(df)
    // doc 1 owns the canonical occurrences (min doc_id)
    assert(got == (4 to 8).map(st => (1L, st, true)) ++
      (0 to 4).map(st => (2L, st, false)))
    val spans = TextQueries.spanIslands(
      TextQueries.dupSpanOccurrences(df).select("doc_id", "st"))
      .select("doc_id", "mn", "mx").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue, r.getAs[Number](2).intValue)).toSet
    assert(spans == Set((1L, 4, 8), (2L, 0, 4))) // (doc, minStart, maxStart)
  }

  test("regions further than SpanL apart stay separate islands") {
    import spark.implicits._
    // doc 3 carries TWO copies of an 8-token region B, separated by
    // 9 unique tokens (> SpanL gap) — two islands, not one.
    val b = toks("b", 8)
    val df = Seq(
      (1L, b + " " + toks("x", 20)),
      (3L, b + " " + toks("y", 9) + " " + b)).toDF("doc_id", "text")
    val spans = TextQueries.spanIslands(
      TextQueries.dupSpanOccurrences(df)
        .where(!org.apache.spark.sql.functions.col("is_canonical"))
        .select("doc_id", "st"))
      .select("doc_id", "mn", "mx").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue, r.getAs[Number](2).intValue)).toSet
    // doc 1's occurrence is canonical; doc 3's two copies (starts 0
    // and 17) are removable and distinct islands.
    assert(spans == Set((3L, 0, 0), (3L, 17, 17)))
  }

  test("apply: the cleaned text drops exactly the non-canonical region") {
    import spark.implicits._
    val a = toks("a", 12)
    val df = Seq(
      (1L, toks("u", 4) + " " + a + " " + toks("v", 6)),
      (2L, a + " " + toks("w", 9))).toDF("doc_id", "text")
    val got = TextQueries.spanDedupApply(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 1 keeps everything (it owns the canonical occurrence);
    // doc 2 loses tokens 0..11 (the copied region) and keeps w0..w8
    assert(got(0) == ((1L, 22L, 22L,
      md5(toks("u", 4) + " " + a + " " + toks("v", 6)))))
    assert(got(1) == ((2L, 21L, 9L, md5(toks("w", 9)))))
  }

  test("end-to-end accounting: kept + removed = total, clean docs untouched") {
    val dir = "/root/testdata/sf0.001"
    val dupes = TextQueries.queries("text_span_dupes")(spark, dir)
    val dedup = TextQueries.queries("text_span_dedup")(spark, dir)
    val rows = dedup.collect()
    assert(rows.length == 500) // every doc appears
    rows.foreach { r =>
      val (n, spans, removed, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(kept + removed == n)
      assert((spans == 0) == (removed == 0))
      // a removable island covers at least one full window
      if (spans > 0) assert(removed >= TextQueries.SpanL)
    }
    // the report includes canonical occurrences, so it covers at
    // least every doc the removal pass touched
    val reportDocs = dupes.select("doc_id").distinct().count()
    val removalDocs = rows.count(_.getLong(3) > 0)
    assert(reportDocs >= removalDocs && removalDocs > 0)
    // the applied text's kept-token count must agree per doc with the
    // accounting query's arithmetic (two independent computations of
    // the same removal)
    val applied = TextQueries.queries("text_span_dedup_apply")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(applied(r.getLong(0)) == r.getLong(4),
        s"doc ${r.getLong(0)}: apply kept ${applied(r.getLong(0))}, accounting kept ${r.getLong(4)}")
    }
  }
}
