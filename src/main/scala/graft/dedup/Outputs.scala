package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T1/T2/A3/A4/O2 — report projections over the full pipeline table
  * (/root/reference/outputs.py:4-68). */
object Outputs {

  private val ContractCols = Seq("row_order", "original_name", "normalized_name",
    "base_name", "cluster_id", "cluster_size", "canonical_name", "confidence", "reason")

  /** Sheet `clusters` (outputs.py:23-24,45). */
  def clusters(full: DataFrame): DataFrame =
    full.select(ContractCols.map(col): _*).orderBy("row_order")

  /** golden_mapping.xlsx (outputs.py:52) — per row, not distinct. */
  def mapping(full: DataFrame): DataFrame =
    full.select("original_name", "canonical_name")
      .orderBy("original_name", "canonical_name")

  /** Sheet `canonical_summary` (outputs.py:30). */
  def summary(full: DataFrame): DataFrame =
    full.groupBy("cluster_id", "canonical_name")
      .agg(count(lit(1)).as("count"))
      .orderBy("cluster_id", "canonical_name")

  /** high_confidence_review.xlsx (outputs.py:56-58). */
  def review(full: DataFrame): DataFrame =
    full.filter(col("confidence") >= 0.95 && col("cluster_size") >= 2)
      .select(ContractCols.map(col): _*).orderBy("row_order")

  /** Run stats (outputs.py:61-66). `multi_record_clusters` counts
    * ROWS in multi-record clusters — reference semantics kept. */
  def stats(full: DataFrame): DataFrame =
    full.agg(
      count(lit(1)).as("total_rows"),
      countDistinct(col("cluster_id")).as("total_clusters"),
      sum(when(col("cluster_size") >= 2, 1L).otherwise(0L)).as("multi_record_clusters"),
      sum(when(col("confidence") >= 0.95 && col("cluster_size") >= 2, 1L).otherwise(0L))
        .as("high_confidence_review_rows"))

  /** Sheet `settings` (outputs.py:32-42) — literal echo table. */
  def settingsEcho(spark: SparkSession, settings: DedupSettings): DataFrame = {
    import spark.implicits._
    Seq(
      ("hard_threshold", settings.hardThreshold.toString),
      ("soft_threshold", settings.softThreshold.toString),
      ("suffix_list_size", "26"),
      ("explicit_maps", settings.addMap.toSeq.sorted.map { case (k, v) => s"$k->$v" }.mkString(";")),
      ("subsidiary_folding", (!settings.noSubsidiaryFold).toString),
      ("preserved_all_rows", "true")
    ).toDF("setting", "value")
  }
}
