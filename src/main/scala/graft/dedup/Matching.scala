package graft.dedup

import graft.functions.functions.jaro_winkler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 + M1/M2 + C2 — the blocking self-join, similarity predicate and
  * pair confidence (engine.py:251-261, 371-375).
  *
  * Scale design: matching depends ONLY on `base_name`, so pairs are
  * generated at the **distinct-name level** (one row per distinct
  * (block_key, base_name)), not the row level. On data with heavy
  * duplication this collapses the O(Σ|b|²) pair join by the square of
  * the duplication factor (part @ sf0.1: 64 distinct names vs 20k
  * rows → 10⁵× fewer pairs); row-level results are recovered by an
  * equi-join on base_name that AQE turns into a broadcast when the
  * name side is small. */
object Matching {

  /** Distinct-name statistics per block. `min_row` doubles as the
    * name's graph-node id; `max_row` drives the per-row confidence
    * rule (SURVEY.md Appendix A.1). `token_key` is precomputed ONCE
    * per distinct name so the pair join compares keys instead of
    * re-sorting tokens per pair (O(names) sorts, not O(pairs)). */
  def nameStats(derived: DataFrame): DataFrame =
    derived
      .filter(col("base_name") =!= "")
      .groupBy("block_key", "base_name")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("row_order")).as("min_row"),
        max(col("row_order")).as("max_row"))
      .withColumn("token_key", concat_ws("", array_sort(split(col("base_name"), " "))))

  /** Pair confidence ladder (engine.py:371-375). The 0.90/0.85 cut
    * points are fixed in the reference, independent of the settings
    * thresholds. */
  def pairConfidence(ratio: org.apache.spark.sql.Column, token: org.apache.spark.sql.Column) =
    when(token && ratio >= 0.90, lit(Rules.ConfTokenAndRatio))
      .when(ratio >= 0.90, lit(Rules.ConfHardRatio))
      .when(ratio >= 0.85, lit(Rules.ConfSoftRatio))
      .otherwise(lit(Rules.ConfDefault))

  /** Qualifying distinct-name pairs within a block: equi-join on
    * `block_key` with `a.base_name < b.base_name` dedup residual, then
    * the reference predicate
    * `(token_match && jw >= soft) || jw >= hard` (engine.py:260).
    * Output columns: a_/b_ name, min/max rows, ratio, token, conf. */
  def qualifyingPairs(stats: DataFrame, settings: DedupSettings = DedupSettings()): DataFrame = {
    val a = stats.select(
      col("block_key"),
      col("base_name").as("a_name"),
      col("min_row").as("a_min_row"),
      col("max_row").as("a_max_row"),
      col("token_key").as("a_token_key"))
    val b = stats.select(
      col("block_key"),
      col("base_name").as("b_name"),
      col("min_row").as("b_min_row"),
      col("max_row").as("b_max_row"),
      col("token_key").as("b_token_key"))
    val ratio = jaro_winkler(col("a_name"), col("b_name"))
    a.join(b, Seq("block_key"))
      .where(col("a_name") < col("b_name"))
      .withColumn("ratio", ratio)
      .withColumn("token_match", col("a_token_key") === col("b_token_key"))
      .drop("a_token_key", "b_token_key")
      .where((col("token_match") && col("ratio") >= settings.softThreshold) ||
        col("ratio") >= settings.hardThreshold)
      .withColumn("pair_conf", pairConfidence(col("ratio"), col("token_match")))
  }
}
