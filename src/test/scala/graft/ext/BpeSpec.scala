package graft.ext

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Pins Bpe.train on the classic Sennrich vocabulary
  * {low:5, lower:2, newest:6, widest:3}, where every merge and every
  * tie-break is computable by hand (no end-of-word marker in this
  * formulation; ties break freq desc, then lhs asc, rhs asc). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("merge sequence matches the hand computation, tie-breaks included") {
    import spark.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = Bpe.train(df, "text", 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: (e,s)=9 ties (s,t)=9, lhs 'e' wins; r2 chains to 'est';
    // r3: (l,o)=7 ties (o,w)=7; r4 chains to 'low'; r5: the three
    // newest pairs tie at 6, 'e' wins; r6: (ew,est) beats (n,ewest)
    // on lhs; r7 finishes 'newest'; r8: widest pairs tie at 3,
    // 'd' wins.
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L),
      (6, "ew", "est", 6L),
      (7, "n", "ewest", 6L),
      (8, "d", "est", 3L)))
  }

  test("greedy fold merges runs left-to-right without chaining") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Tuple1(Seq("a", "a", "a")), Tuple1(Seq("a", "a", "a", "a")))
      .toDF("sym")
    val got = df.select(Bpe.applyMerge(col("sym"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0)).toSet
    assert(got == Set(Seq("aa", "a"), Seq("aa", "aa")))
  }

  test("training exhausts gracefully when no pairs remain") {
    import spark.implicits._
    val df = Seq((1L, "x y x y")).toDF("doc_id", "text")
    // single-char words only: zero adjacent pairs, zero merges
    assert(Bpe.train(df, "text", 4).count() == 0)
  }

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("batched training is bit-identical to sequential at every batch size") {
    import spark.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val seqMerges = asTuples(Bpe.train(df, "text", 8))
    for (b <- Seq(2, 4, 8, 16))
      assert(asTuples(Bpe.train(df, "text", 8, batch = b)) == seqMerges,
        s"batch=$b diverged from sequential")
  }

  test("batched training survives adjacent-rank conflicts (shared symbols)") {
    import spark.implicits._
    // "ab" dominates, and the #2 pair (b,c) SHARES b with it — the
    // batch must stop at the conflict and fall back to sequential
    // order, not apply both from stale counts
    val text = (Seq.fill(10)("ab") ++ Seq.fill(7)("abc") ++
      Seq.fill(4)("bcd")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val seqMerges = asTuples(Bpe.train(df, "text", 6))
    for (b <- Seq(2, 4, 8))
      assert(asTuples(Bpe.train(df, "text", 6, batch = b)) == seqMerges,
        s"batch=$b diverged from sequential on conflicting vocabulary")
  }

  test("count-flat ties batch instead of serializing, bit-identical") {
    import spark.implicits._
    // 10 mutually-disjoint two-char words, all at the same frequency:
    // every pair-count round is completely count-flat. Before the tie
    // extension this forced one merge per pair-count job; with it a
    // batch of 4 must learn 4 tied merges per job (the rj-max guard
    // proves no created pair can reach the tie) and still reproduce
    // the sequential vocabulary exactly.
    val ws = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st")
    val text = ws.flatMap(Seq.fill(7)(_)).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val seqMerges = asTuples(Bpe.train(df, "text", 10))
    Bpe.train(df, "text", 10, batch = 1)
    val seqRounds = Bpe.lastTrainStats.get._1
    val batched = asTuples(Bpe.train(df, "text", 10, batch = 4))
    val batchedRounds = Bpe.lastTrainStats.get._1
    assert(batched == seqMerges)
    assert(seqRounds == 10, s"sequential should pay one job per merge")
    assert(batchedRounds <= 4,
      s"tied merges must batch: $batchedRounds pair-count rounds for 10 merges at batch=4")
  }

  test("tie extension refuses the created-pair steal (rj-max guard)") {
    import spark.implicits._
    // (a,z), (c,d), (z,b) all tie at 10. (a,z) and (c,d) are disjoint,
    // but merging (a,z) CREATES ("az", b) at count 10 — which sorts
    // BEFORE (c,d) — so sequential learns (a,z), (az,b), (c,d) and a
    // naive tie batch of {(a,z), (c,d)} would diverge. The rj-max
    // guard sees max f over pairs with lhs "z" == fstop and refuses.
    val text = (Seq.fill(10)("azb") ++ Seq.fill(10)("cd")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val seqMerges = asTuples(Bpe.train(df, "text", 3))
    assert(seqMerges.map(t => (t._2, t._3)) ==
      Seq(("a", "z"), ("az", "b"), ("c", "d")))
    for (b <- Seq(2, 4, 8))
      assert(asTuples(Bpe.train(df, "text", 3, batch = b)) == seqMerges,
        s"batch=$b diverged from sequential on the steal vocabulary")
  }

  test("randomized differential: batch == sequential on 12 seeded corpora") {
    import spark.implicits._
    // Deterministic pseudo-random corpora over a 5-char alphabet:
    // short words over a tiny alphabet maximize exact count ties,
    // shared symbols, and concat collisions (words like "ab" coexist
    // with pairs (a,b)) — the three hazards the batch guard must
    // survive. Every corpus must train bit-identically at every
    // batch size; a guard bug shows up as a merge-order divergence.
    val alpha = "abcde"
    for (seed <- 0 until 12) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(30) {
        val len = 1 + rnd.nextInt(4)
        (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(9))(w)).mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val seqMerges = asTuples(Bpe.train(df, "text", 12))
      for (b <- Seq(4, 16))
        assert(asTuples(Bpe.train(df, "text", 12, batch = b)) == seqMerges,
          s"seed=$seed batch=$b diverged from sequential")
    }
  }

  test("batched training survives a concat-collision hazard") {
    import spark.implicits._
    // pre-existing symbol string "ab" (the word "ab" is one merge
    // away) collides with the concat of the top pair (a,b) — the
    // fhaz aggregate must throttle the batch so a pair whose count
    // GROWS after the merge is still picked in sequential order
    val text = (Seq.fill(9)("azb") ++ Seq.fill(8)("ab") ++
      Seq.fill(7)("abq") ++ Seq.fill(6)("mn")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    for (rounds <- Seq(3, 5); b <- Seq(2, 4, 8))
      assert(asTuples(Bpe.train(df, "text", rounds, batch = b)) ==
        asTuples(Bpe.train(df, "text", rounds)),
        s"rounds=$rounds batch=$b diverged from sequential")
  }
}
