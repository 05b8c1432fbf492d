package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r13 item 6): measure BPE merge batching on a
  * REALISTIC count distribution instead of the synthetic tie-heavy
  * fixture. The "32k merges ≈ minutes, not hours" extrapolation in
  * SCALE.md rests on the claim that real corpora have mostly-distinct
  * pair counts (so the batch guard rarely truncates); this tool
  * builds a zipfian word distribution — the shape natural language
  * actually has (Zipf 1949) — and reports pcRounds (pair-count Spark
  * jobs actually paid) vs merges learned, at a merge budget big
  * enough to reach the flat tail where ties live.
  *
  * Corpus construction is fully deterministic (no RNG): word ranks
  * 1..V get frequency max(1, C/rank) — integer-division zipf s=1 —
  * and the word STRING for rank r is its base-26 letter encoding, so
  * words share character structure (prefix/suffix overlap) the way
  * real vocabulary does and BPE has real merge structure to learn.
  *
  * {{{
  *   sbt -batch "runMain graft.tools.BpeZipf 50000 100000 256 8 relaxed"
  *   // vocabSize, topWordFreq, merge rounds, batch, mode(exact|relaxed)
  * }}}
  *
  * Prints one JSON line: rounds, batch, pcRounds, merges, wall
  * seconds, corpus shape. NOT part of the library surface. */
object BpeZipf {
  /** English letters in frequency order — the naturalistic letter
    * marginal the generator skews toward. */
  private val Letters = "etaoinshrdlcumwfgypbvkjxqz"

  /** splitmix64 finalizer — deterministic position/rank mixing with
    * no RNG state. */
  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9e3779b97f4a7c15L + b
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  /** rank → deterministic pseudo-word with naturalistic statistics:
    * length 3-8, each letter drawn from a quadratically-skewed
    * frequency-ordered alphabet (u² over the ranked letters ≈ the
    * Zipfian letter marginal of English). Unlike a dense base-26 rank
    * encoding — whose top pair counts ALL involve 'a'/'b' and force
    * the batch conflict rule to stop at one merge per round — this
    * gives the digraph diversity real text has, so the measurement
    * exercises the distribution the extrapolation claims to hold on.
    * Rank collisions just merge two frequency masses (Bpe.train
    * groups by word anyway). */
  private def wordOf(rank: Long): String = {
    val len = 3 + (mix(rank, 0) % 6).toInt
    (1 to len).map { pos =>
      val u = (mix(rank, pos) % 100003).toDouble / 100003.0
      Letters(math.min(25, (u * u * 26).toInt))
    }.mkString
  }

  def main(args: Array[String]): Unit = {
    val vocab = args.lift(0).map(_.toLong).getOrElse(50000L)
    val topFreq = args.lift(1).map(_.toLong).getOrElse(100000L)
    val rounds = args.lift(2).map(_.toInt).getOrElse(256)
    val batch = args.lift(3).map(_.toInt).getOrElse(8)
    val mode = args.lift(4).getOrElse("exact")
    require(mode == "exact" || mode == "relaxed", s"bad mode: $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val word = udf(wordOf _)
    // one doc per word occurrence: rank r contributes max(1, C/r)
    // single-word docs — Bpe.train immediately groups to (word, freq),
    // so the explode is the honest way in without bypassing its API
    val corpus = spark.range(1, vocab + 1)
      .select(word(col("id")).as("w"),
        greatest(lit(1L), lit(topFreq) / col("id")).cast("int").as("freq"))
      .select(explode(array_repeat(col("w"), col("freq"))).as("text"))
    val nDocs = corpus.count()

    val t0 = System.nanoTime()
    val merges = graft.ext.Bpe.train(corpus, "text", rounds, batch = batch,
      exact = mode == "exact")
    val nMerges = merges.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val (pcRounds, learned) = graft.ext.Bpe.lastTrainStats.getOrElse((-1, -1))

    println(f"""{"tool":"bpe_zipf","vocab":$vocab,"top_freq":$topFreq,""" +
      f""""word_occurrences":$nDocs,"rounds":$rounds,"batch":$batch,"mode":"$mode",""" +
      f""""pc_rounds":$pcRounds,"merges":$learned,"merge_rows":$nMerges,""" +
      f""""wall_sec":$wall%.1f}""")
    spark.stop()
  }
}
