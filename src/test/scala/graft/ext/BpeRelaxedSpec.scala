package graft.ext

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Differential bounds for the RELAXED BPE batching mode (VERDICT r14
  * item 4): exact mode is the oracle; relaxed trades exact merge
  * order for fewer pair-count rounds. The spec pins what the trade
  * actually costs on seeded corpora — determinism, a floor under the
  * merge-set overlap, and the round savings that justify the mode. */
class BpeRelaxedSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def pairSet(ms: Seq[(Int, String, String, Long)]) =
    ms.map(m => (m._2, m._3)).toSet

  /** Seeded corpus with conflict-heavy head counts: words over a
    * 7-char alphabet with zipf-ish repetition, so top pairs share
    * symbols and the exact mode's first-conflict stop engages. */
  private def corpus(seed: Int) = {
    import spark.implicits._
    val alpha = "abcdefg"
    val rnd = new scala.util.Random(seed)
    val words = Seq.fill(60) {
      val len = 2 + rnd.nextInt(5)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(1 + 60 / (i + 1))(w) }.mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("relaxed batch=1 is byte-identical to exact (no relaxation without batching)") {
    for (seed <- 0 until 3) {
      val df = corpus(seed)
      assert(asTuples(Bpe.train(df, "text", 12, batch = 1, exact = false)) ==
        asTuples(Bpe.train(df, "text", 12, batch = 1)), s"seed=$seed")
    }
  }

  test("relaxed mode is deterministic run-to-run") {
    val df = corpus(7)
    val a = asTuples(Bpe.train(df, "text", 16, batch = 8, exact = false))
    val b = asTuples(Bpe.train(df, "text", 16, batch = 8, exact = false))
    assert(a == b)
  }

  test("relaxed batches stay mutually disjoint (one-fold application is order-free)") {
    for (seed <- 0 until 5) {
      // The invariant the one-fold application depends on, pinned
      // DIRECTLY (ADVICE r15): within each pair-count round's accepted
      // batch — exposed per-round via lastTrainBatches — no merge's
      // symbol may equal another same-round merge's symbol OR concat.
      val df = corpus(seed)
      val merges = asTuples(Bpe.train(df, "text", 16, batch = 8, exact = false))
      val ml = merges.map(m => (m._2, m._3))
      val batches = Bpe.lastTrainBatches.get
      assert(batches.map(_.size).sum == merges.size) // hook covers every merge
      batches.zipWithIndex.foreach { case (b, round) =>
        val prot = scala.collection.mutable.Set.empty[String]
        b.foreach { case (l, r) =>
          assert(!(prot(l) || prot(r) || prot(l + r)),
            s"seed=$seed round=$round merge $l+$r overlaps its own batch: $b")
          prot ++= Seq(l, r, l + r)
        }
      }
      // each learned concat must segment to itself under the prefix of
      // merges up to and including its own rank — i.e. the merge list
      // is self-consistent and applicable in rank order
      merges.zipWithIndex.foreach { case (m, i) =>
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val seg = Seq(Tuple1(m._2 + m._3)).toDF("w")
          .select(Bpe.segment(col("w"), ml.take(i + 1)).as("s"))
          .head().getSeq[String](0)
        assert(seg == Seq(m._2 + m._3),
          s"seed=$seed merge ${m._2}+${m._3} does not survive its own prefix")
      }
    }
  }

  test("relaxed vs exact: bounded divergence, fewer pair-count rounds") {
    var totalOverlap = 0.0
    var n = 0
    for (seed <- 0 until 5) {
      val df = corpus(seed)
      val exact = asTuples(Bpe.train(df, "text", 24, batch = 8))
      val (exRounds, exMerges) = Bpe.lastTrainStats.get
      val relaxed = asTuples(Bpe.train(df, "text", 24, batch = 8, exact = false))
      val (rxRounds, rxMerges) = Bpe.lastTrainStats.get
      assert(rxMerges == exMerges || rxMerges >= 20,
        s"seed=$seed relaxed learned $rxMerges vs exact $exMerges")
      // the whole point: relaxed pays no more rounds, usually far fewer
      assert(rxRounds <= exRounds,
        s"seed=$seed relaxed took $rxRounds rounds vs exact $exRounds")
      val overlap = pairSet(relaxed).intersect(pairSet(exact)).size.toDouble /
        math.max(1, exact.size)
      val headOverlap = pairSet(relaxed.take(12))
        .intersect(pairSet(exact.take(12))).size.toDouble / 12
      info(f"seed=$seed overlap=$overlap%.2f head=$headOverlap%.2f " +
        s"rounds=$rxRounds/$exRounds")
      totalOverlap += overlap
      n += 1
    }
    // merge-set overlap floor, measured on THESE corpora (mean 0.62;
    // tiny 60-word conflict-heavy vocabularies are the adversarial
    // case — the 24-merge budget reaches deep into the count-1 noise
    // tail where order is arbitrary; the zipfian corpus in SCALE.md
    // measures the realistic number). The floor guards against a
    // regression that tanks overlap structurally (e.g. acceptance
    // scanning an unsorted window), not against tail noise.
    assert(totalOverlap / n >= 0.5,
      f"mean merge-set overlap ${totalOverlap / n}%.2f fell below the floor")
  }
}
