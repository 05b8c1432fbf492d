package graft.queries

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the duplicated-span family: random corpora
  * with PLANTED cross-doc span copies (plus the natural duplicates a
  * tiny vocabulary creates), graded against a brute-force in-memory
  * oracle that re-implements the Lee-et-al semantics from the paper
  * statement — window occurrences by CONTENT (no hashing: any
  * divergence from the engine's two-seed xxhash grouping would mean a
  * 128-bit collision), corpus-first canonical election by
  * min (doc_id, st), gaps-and-islands merge at distance SpanL, and
  * the cut-ranges text rebuild. The DuckDB twins grade the family on
  * the fixed testdata; this pins the semantics on corpora those
  * tables never exercise (empty docs, whitespace-edge tokens,
  * adjacent/overlapping plants, whole-doc copies). */
class SpanDedupFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val L = TextQueries.SpanL

  // ---- brute-force oracle ------------------------------------------------

  /** Mirrors TextOps.words = Spark split(text, "\\s+") — limit -1
    * keeps trailing empty tokens, leading whitespace yields a leading
    * "" token. The oracle must tokenize IDENTICALLY or the fuzz would
    * flag tokenization, not span logic. */
  private def words(t: String): Vector[String] = t.split("\\s+", -1).toVector

  /** All occurrences of duplicated L-windows: (doc_id, st, canonical). */
  private def dupOccs(docs: Seq[(Long, String)]): Seq[(Long, Int, Boolean)] = {
    val occ = for {
      (id, t) <- docs
      w = words(t)
      if w.size >= L
      st <- 0 to w.size - L
    } yield (id, st, w.slice(st, st + L))
    val groups = occ.groupBy(_._3).filter(_._2.size > 1)
    groups.values.flatten.toSeq.map { case (id, st, sl) =>
      val first = groups(sl).map(o => (o._1, o._2)).min
      (id, st, (id, st) == first)
    }
  }

  /** Gaps-and-islands merge of window starts (gap > L breaks). */
  private def islands(sts: Seq[Int]): Seq[(Int, Int)] = {
    val sorted = sts.sorted
    sorted.foldLeft(List.empty[(Int, Int)]) {
      case (Nil, st) => List((st, st))
      case ((mn, mx) :: rest, st) =>
        if (st - mx <= L) (mn, st) :: rest else (st, st) :: (mn, mx) :: rest
    }.reverse
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- corpus generator ---------------------------------------------------

  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    val n = 20 + rnd.nextInt(30)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    (0 until n).foreach { i =>
      val base = Vector.fill(rnd.nextInt(41))(vocab(rnd.nextInt(vocab.size)))
      val toks = if (out.nonEmpty && base.size >= 1 && rnd.nextDouble() < 0.5) {
        // plant: splice a window copied from an earlier doc (possibly
        // whole-doc, possibly shorter than L — must NOT create a span)
        val (_, srcText) = out(rnd.nextInt(out.size))
        val src = words(srcText)
        if (src.isEmpty) base
        else {
          val len = 1 + rnd.nextInt(math.min(src.size, L * 2 + 4))
          val st = rnd.nextInt(src.size - len + 1)
          val at = rnd.nextInt(base.size + 1)
          base.take(at) ++ src.slice(st, st + len) ++ base.drop(at)
        }
      } else base
      // whitespace edges: occasional leading/trailing/double spaces
      // exercise the empty-token behavior both engines share
      val sep = if (rnd.nextDouble() < 0.1) "  " else " "
      val text0 = toks.mkString(sep)
      val text = (if (rnd.nextDouble() < 0.08) " " else "") + text0
      out += ((i.toLong, text))
    }
    out.toSeq
  }

  // ---- the differential runs ----------------------------------------------

  test("span dupes/accounting/apply agree with the brute-force oracle on 15 random corpora") {
    import spark.implicits._
    (1L to 15L).foreach { seed =>
      val docs = corpus(seed * 7919)
      val df = docs.toDF("doc_id", "text")
      val occ = dupOccs(docs)

      // 1) detect: islands over ALL duplicated occurrences
      val wantDupes = occ.groupBy(_._1).toSeq.flatMap { case (id, os) =>
        islands(os.map(_._2)).map { case (mn, mx) =>
          (id, mn.toLong, (mx + L - 1).toLong, (mx + L - mn).toLong)
        }
      }.sorted
      val gotDupes = TextQueries.spanIslands(
          TextQueries.dupSpanOccurrences(df).select("doc_id", "st"))
        .collect().map { r =>
          val (mn, mx) = (r.getAs[Int]("mn"), r.getAs[Int]("mx"))
          (r.getAs[Long]("doc_id"), mn.toLong, (mx + L - 1).toLong, (mx + L - mn).toLong)
        }.toSeq.sorted
      assert(gotDupes == wantDupes, s"seed=$seed dupes diverged")

      // 2) + 3) apply: kept token counts AND the rebuilt bytes
      val wantApply = docs.map { case (id, t) =>
        val w = words(t)
        val cuts = islands(occ.filter(o => o._1 == id && !o._3).map(_._2))
        val kept = w.zipWithIndex.collect {
          case (tok, i) if !cuts.exists(c => i >= c._1 && i <= c._2 + L - 1) => tok
        }
        (id, w.size.toLong, kept.size.toLong, md5hex(kept.mkString(" ")))
      }.sorted
      val gotApply = TextQueries.spanDedupApply(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sorted
      assert(gotApply == wantApply, s"seed=$seed apply diverged")
    }
  }
}
