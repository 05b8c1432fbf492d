package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-learning step a training-data pipeline runs before
  * token counting or packing can be tokenizer-faithful.
  *
  * Scale shape: training operates on the WORD-FREQUENCY table, never
  * the corpus. The corpus is scanned exactly once (word count — a
  * map-side-combinable aggregate); by Heaps' law the distinct-word
  * table is orders of magnitude smaller than a 100 TB corpus, and
  * every merge round is one narrow shuffle over it (pair counts,
  * partially aggregated map-side) plus a row-local rewrite of the
  * symbol arrays (a codegen'd fold — no shuffle). The per-round
  * argmax is a 1-row collect: a scalar decision, same class as the
  * suite's other gated driver steps. Rounds are localCheckpoint'ed so
  * round k doesn't replay rounds 1..k-1's rewrites, with the
  * superseded checkpoint released immediately (the Cluster.scala
  * discipline).
  */
object Bpe {

  /** Greedy left-to-right application of ONE merge (l, r) to a symbol
    * array, as classic BPE does within a round: a fold that replaces
    * the accumulator's last element with l+r when it equals l and the
    * incoming symbol equals r. Runs like "a a a" merge (0,1) and
    * leave the tail, because the merged symbol no longer compares
    * equal to l. Entirely row-local and codegen'd — no shuffle. */
  private[graft] def applyMerge(sym: Column, l: String, r: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Frequency-weighted adjacent-pair counts over the symbol table.
    * Pair emission is a row-local indexed transform (no join of the
    * table to itself); the groupBy gets map-side partial combine, so
    * the exchange carries one row per DISTINCT pair per map task. */
  private[graft] def pairCounts(words: DataFrame): DataFrame = words
    .select(col("freq"),
      explode(transform(slice(col("sym"), lit(1), size(col("sym")) - 1),
        (x, i) => struct(x.as("l"),
          element_at(col("sym"), i + 2).as("r")))).as("p"))
    .groupBy(col("p.l").as("l"), col("p.r").as("r"))
    .agg(sum("freq").as("f"))

  /** Split a word column into its BPE symbols under an ordered merge
    * list: the char base split followed by one greedy fold per merge,
    * all row-local and codegen'd. Apply it to the DISTINCT-word
    * table and join back — tokenizing the vocabulary once is the
    * 100 TB shape; never run the fold chain over every corpus row. */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(word, "(?!^)(?=.)")) {
      case (sym, (l, r)) => applyMerge(sym, l, r)
    }

  /** Learn `rounds` merges from the corpus' word-frequency table.
    * Returns (rank, lhs, rhs, freq) in learning order — the merge
    * list IS the tokenizer vocabulary beyond the character base.
    * Ties break deterministically: freq desc, then (lhs, rhs) asc,
    * binary collation in both engines. */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    // split into chars via a zero-width split: (?!^) skips the start
    // position, (?=.) requires a following char — Spark's split keeps
    // trailing empty strings (limit -1), so a plain (?!^) would add a
    // phantom "" symbol to every word
    var words = docs
      .select(explode(TextOps.words(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(split(col("word"), "(?!^)(?=.)").as("sym"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var done = false
    for (round <- 1 to rounds if !done) {
      val best = pairCounts(words)
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true // every word fully merged
      else {
        val (l, r, f) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, l, r, f))
        val next = words
          .select(applyMerge(col("sym"), l, r).as("sym"), col("freq"))
          .localCheckpoint()
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    import spark.implicits._
    merges.result().toDF("rank", "lhs", "rhs", "freq").orderBy("rank")
  }
}
