package graft.queries

import graft.dedup.SparkTest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-7 additions: ordered conversion funnel,
  * weekly cohort retention, temperature-scaled mixture sampling, and
  * deterministic shard export. */
class FunnelMixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def events(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "epoch")
      .withColumn("ts", col("epoch").cast("timestamp"))
      .select("user_id", "event_type", "ts")
  }

  // --- funnel ------------------------------------------------------

  test("funnel honors stage ordering: only views after signup and purchases after that view count") {
    val ev = events(Seq(
      (1L, "signup", 100L), (1L, "view", 200L), (1L, "purchase", 300L),
      // view strictly before signup never counts; the later purchase
      // has no qualifying view, so the user stalls at stage 1
      (2L, "view", 50L), (2L, "signup", 100L), (2L, "purchase", 200L),
      // purchase before the first qualifying view → stage 2
      (3L, "signup", 100L), (3L, "purchase", 150L), (3L, "view", 400L),
      // no signup → excluded from the funnel entirely
      (4L, "view", 100L), (4L, "purchase", 200L),
      (5L, "signup", 100L)))
    val got = EventQueries.funnel(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq
    assert(got == Seq((1L, 3L), (2L, 1L), (3L, 2L), (5L, 1L)))
  }

  test("funnel picks the FIRST qualifying timestamp per stage") {
    val ev = events(Seq(
      (9L, "signup", 300L), (9L, "signup", 100L),
      (9L, "view", 150L), (9L, "view", 250L), (9L, "view", 500L),
      (9L, "purchase", 240L), (9L, "purchase", 260L)))
    val r = EventQueries.funnel(ev).head()
    assert(r.getTimestamp(1).getTime == 100L * 1000) // earliest signup
    assert(r.getTimestamp(2).getTime == 150L * 1000) // first view ≥ signup
    assert(r.getTimestamp(3).getTime == 240L * 1000) // first purchase ≥ the view at 150
    assert(r.getLong(4) == 3L)
  }

  // --- retention ---------------------------------------------------

  test("retention buckets users by first epoch week and counts distinct actives per offset") {
    val wk = 604800L
    val ev = events(Seq(
      (1L, "view", 10L), (1L, "view", wk + 10L), // cohort 0, weeks 0+1
      (2L, "view", 20L), (2L, "view", 25L), // cohort 0, week 0 only
      (3L, "view", wk + 5L), (3L, "view", 3 * wk + 5L))) // cohort 1, weeks 1+3
    val got = EventQueries.retention(ev)
      .orderBy("cohort_w", "week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L),
      (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  // --- anomalies ---------------------------------------------------

  test("anomalies flags the spike hour and only the spike hour") {
    // 23 quiet hours at ~2 events, one hour at 40 → lone high-z hour
    val quiet = (0 until 23).flatMap(h =>
      Seq((1L, "click", h * 3600L + 10), (2L, "click", h * 3600L + 20)))
    val spike = (1L to 40L).map(u => (u, "click", 23 * 3600L + 30))
    val got = EventQueries.anomalies(events(quiet ++ spike)).collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 23L) // the spike hour
    assert(got.head.getLong(2) == 40L)
    assert(got.head.getDouble(3) > 2.0)
  }

  test("anomalies is quiet on a flat series") {
    val flat = (0 until 24).flatMap(h =>
      Seq((1L, "view", h * 3600L + 1), (2L, "view", h * 3600L + 2)))
    assert(EventQueries.anomalies(events(flat)).count() == 0)
  }

  // --- temperature sampling ----------------------------------------

  private def docsOf(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_chars")
  }

  test("temperature rates follow sqrt weighting over a half-corpus budget") {
    // srcA: 4 docs / 400 chars → w=20; srcB: 1 doc / 100 chars → w=10
    // budget = 5 * 0.5 = 2.5 docs
    // rateA = (20/30)*2.5/4 = 0.416667; rateB = (10/30)*2.5/1 = 0.833333
    val d = docsOf(Seq(
      (1L, "srcA", 100L), (2L, "srcA", 100L), (3L, "srcA", 100L),
      (4L, "srcA", 100L), (5L, "srcB", 100L)))
    val rates = TextQueries.temperatureSample(d)
      .select("source", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rates("srcA") - 0.416667) < 1e-6)
    assert(math.abs(rates("srcB") - 0.833333) < 1e-6)
  }

  test("temperature rate caps at 1.0 for under-represented sources") {
    // srcTiny's share of the budget exceeds its doc count → rate 1,
    // i.e. temperature sampling never drops the whole tail source
    val d = docsOf(
      (1L to 40L).map(i => (i, "srcBig", 100L)) :+ (99L, "srcTiny", 100L))
    val rates = TextQueries.temperatureSample(d)
      .select("source", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("srcTiny") == 1.0)
    assert(rates("srcBig") < 1.0)
  }

  test("temperature keep decision is deterministic across invocations") {
    val d = docsOf((1L to 50L).map(i => (i, s"s${i % 3}", 50L + i)))
    def run() = TextQueries.temperatureSample(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3))).toSeq
    assert(run() == run())
  }

  // --- LM scoring --------------------------------------------------

  test("lm score matches hand-computed add-1 bigram log-probs") {
    import spark.implicits._
    // corpus: a×3 b×2 c×1 → V=3, c1(a)=3; bigrams (a,b)×2, (a,c)×1
    // logp(a,b) = ln(3/6) = -0.693147; logp(a,c) = ln(2/6) = -1.098612
    // (per-bigram 6 dp; the mean is read out UNROUNDED through the
    // exact micro-unit path — tools/fuzz.py seed 5 killed the 4-dp
    // readout, see lmScore)
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextQueries.lmScore(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, -0.693147), (2L, 1L, -0.693147), (3L, 1L, -1.098612)))
  }

  test("lm score: single-word docs emit zero bigrams and a null score") {
    import spark.implicits._
    val d = Seq((1L, "hello"), (2L, "hello world")).toDF("doc_id", "text")
    val got = TextQueries.lmScore(d).orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 0L && got(0).isNullAt(2))
    assert(got(1).getLong(1) == 1L && !got(1).isNullAt(2))
  }

  // --- TF-IDF ------------------------------------------------------

  test("tfidf ranks terms by score with term-name tie-break") {
    import spark.implicits._
    // N=3; df: cat 1, dog 2, fish 2, bird 1
    val d = Seq((1L, "cat cat dog"), (2L, "dog fish"),
      (3L, "fish fish fish bird")).toDF("doc_id", "text")
    val got = TextQueries.tfidf(d, 3).orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, "cat", 2.1972), (1L, 2L, "dog", 0.4055),
      // doc 2: dog and fish tie at ln(1.5) → alphabetical order
      (2L, 1L, "dog", 0.4055), (2L, 2L, "fish", 0.4055),
      (3L, 1L, "fish", 1.2164), (3L, 2L, "bird", 1.0986)))
  }

  // --- shard export ------------------------------------------------

  test("shard export emits every doc once with dense 1..n positions per shard") {
    val d = docsOf((0L until 100L).map(i => (i, "s", 10L)))
    val rows = TextQueries.shardExport(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == (0L until 100L).toSet)
    assert(rows.forall { case (_, shard, _) => shard >= 0 && shard < 8 })
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).sorted.toSeq == (1L to members.size).toSeq)
    }
  }

  // --- randomized invariants (seeded, repo convention) -------------

  test("lm score invariants hold on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val d = (1L to 60L).map { i =>
      val n = rnd.nextInt(8) // 0..7 words
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val wordCounts = d.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").length).toMap
    TextQueries.lmScore(d).collect().foreach { r =>
      val (id, nBg) = (r.getLong(0), r.getLong(1))
      // a doc with w words has exactly max(0, w-1) bigrams
      assert(nBg == math.max(0, wordCounts(id) - 1), s"doc $id")
      // add-1 smoothed probabilities never exceed 1 → log-probs ≤ 0
      if (nBg > 0) assert(r.getDouble(2) <= 0.0, s"doc $id positive logp")
      else assert(r.isNullAt(2))
    }
  }

  test("temperature sampling's expected keep volume never exceeds the budget") {
    import spark.implicits._
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val d = (1L to 200L)
        .map(i => (i, s"src${rnd.nextInt(7)}", 20L + rnd.nextInt(500)))
        .toDF("doc_id", "source", "n_chars")
      val perSrc = TextQueries.temperatureSample(d)
        .groupBy("source")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.first("rate").as("rate"))
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
      val expectedKeep = perSrc.map { case (n, rate) => n * rate }.sum
      val budget = 200 * 0.5
      assert(expectedKeep <= budget * 1.001,
        s"seed $seed: expected $expectedKeep > budget $budget")
      perSrc.foreach { case (_, rate) => assert(rate > 0.0 && rate <= 1.0) }
    }
  }

  test("shard export covers arbitrary sparse id sets exactly once") {
    val rnd = new scala.util.Random(23)
    val ids = Set.fill(80)(rnd.nextLong().abs % 1000000007L)
    val d = docsOf(ids.toSeq.map(i => (i, "s", 1L)))
    val rows = TextQueries.shardExport(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == ids)
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).sorted.toSeq == (1L to members.size).toSeq)
    }
  }

  test("funnel output is internally consistent on random event streams") {
    val types = Vector("signup", "view", "purchase", "click")
    for (seed <- Seq(3, 31)) {
      val rnd = new scala.util.Random(seed)
      val ev = events((1 to 400).map(_ =>
        (rnd.nextInt(20).toLong, types(rnd.nextInt(types.size)),
          rnd.nextInt(100000).toLong)))
      val signupUsers = ev.filter("event_type = 'signup'")
        .select("user_id").distinct().count()
      val rows = EventQueries.funnel(ev).collect()
      assert(rows.length == signupUsers) // exactly the signed-up users
      rows.foreach { r =>
        val stage = r.getLong(4)
        val (s, v, p) = (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))
        assert(s != null)
        assert((v != null) == (stage >= 2) && (p != null) == (stage == 3))
        if (v != null) assert(!v.before(s))
        if (p != null) assert(!p.before(v))
      }
    }
  }

  test("shard export is deterministic and decorrelates adjacent doc ids") {
    val d = docsOf((0L until 64L).map(i => (i, "s", 10L)))
    def run() = TextQueries.shardExport(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run()
    assert(a == run())
    // adjacent ids should not all land in the same shard
    val sameShardAdjacent = a.sliding(2).count {
      case Seq((_, s1, _), (_, s2, _)) => s1 == s2
      case _ => false
    }
    assert(sameShardAdjacent < 40)
  }
}
