package graft.queries

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

class PiiLineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  // --- piiScan -----------------------------------------------------

  test("piiScan counts and redacts emails and phones") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or 12-345-678-9012"),
      (2L, "two mails a@b.co c.d@e.org, no phone"),
      (3L, "nothing sensitive here at all"))
      .toDF("id", "txt")
    val got = TextQueries.piiScan(df, "id", "txt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 1L), (2L, 2L, 0L), (3L, 0L, 0L)))
  }

  test("redacted hash equals the hash of the explicit redaction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "mail x@y.io phone 12-345-678-9012 end")).toDF("id", "txt")
    val got = TextQueries.piiScan(df, "id", "txt")
      .select("redacted_hash").head().getString(0)
    val want = Seq("mail [EMAIL] phone [PHONE] end").toDF("t")
      .select(md5(col("t"))).head().getString(0)
    assert(got == want)
  }

  // --- lineDedup ---------------------------------------------------

  /** A deterministic chunk of 32 distinct words, parameterized so
    * chunks can be shared or unique across docs. */
  private def chunk(tag: String): String =
    (0 until 32).map(i => s"$tag$i").mkString(" ")

  test("first corpus-wide occurrence of a chunk survives; later copies drop") {
    import spark.implicits._
    val df = Seq(
      (1L, chunk("a") + " " + chunk("b")), // both first occurrences
      (2L, chunk("a") + " " + chunk("c")), // chunk a is a dup of doc 1's
      (3L, chunk("c"))) // dup of doc 2's chunk c
      .toDF("doc_id", "text")
    val got = TextQueries.lineDedup(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 1L, 0L)))
  }

  test("within-doc repeated chunks also dedup (first position wins)") {
    import spark.implicits._
    val df = Seq((7L, chunk("x") + " " + chunk("x"))).toDF("doc_id", "text")
    val got = TextQueries.lineDedup(df).head()
    assert((got.getLong(1), got.getLong(2)) == (2L, 1L))
  }

  test("kept_text_hash reassembles surviving chunks in position order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, chunk("a")),
      (2L, chunk("b") + " " + chunk("a") + " " + chunk("c")))
      .toDF("doc_id", "text")
    val got = TextQueries.lineDedup(df)
      .filter(col("doc_id") === 2L).head().getString(3)
    // doc 2 keeps chunks b and c (a is doc 1's), joined in order
    val want = Seq(chunk("b") + " " + chunk("c")).toDF("t")
      .select(md5(col("t"))).head().getString(0)
    assert(got == want)
  }

  test("doc whose every chunk is a dup hashes the empty string") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, chunk("z")), (2L, chunk("z"))).toDF("doc_id", "text")
    val got = TextQueries.lineDedup(df)
      .filter(col("doc_id") === 2L).head()
    assert(got.getLong(2) == 0L)
    val emptyMd5 = Seq("").toDF("t").select(md5(col("t"))).head().getString(0)
    assert(got.getString(3) == emptyMd5)
  }

  test("short tail chunk (under 32 words) is still a dedup unit") {
    import spark.implicits._
    val df = Seq(
      (1L, chunk("a") + " tail words"),
      (2L, "tail words")) // doc 2's whole text = doc 1's tail chunk
      .toDF("doc_id", "text")
    val got = TextQueries.lineDedup(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L), (2L, 1L, 0L)))
  }
}
