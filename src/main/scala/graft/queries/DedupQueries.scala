package graft.queries

import graft.core.Tables
import graft.dedup._
import graft.oracle.Sql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for the dedup pipeline core (SURVEY.md
  * §2.1). Each entry returns a deterministic, totally-ordered
  * DataFrame and has a DuckDB twin in [[oracle]]. */
object DedupQueries {

  /** part is the dedup workhorse: heavy exact duplication (64 distinct
    * names at any sf) exercises the distinct-name optimization;
    * supplier (all-unique, pairwise-similar names) exercises the dense
    * pair join. */
  private def derivedPart(s: SparkSession, dir: String): DataFrame =
    Normalize.withDerived(Tables.part(s, dir), "p_name", "p_partkey")

  private def derivedSupplier(s: SparkSession, dir: String): DataFrame =
    Normalize.withDerived(Tables.supplier(s, dir), "s_name", "s_suppkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1-F5 + K1: full derived-column contract, row-level.
    "dedup_normalize" -> ((s, dir) =>
      derivedPart(s, dir)
        .select("row_order", "original_name", "normalized_name", "base_name", "block_key")
        .orderBy("row_order")),

    // B1: blocking as a key-grouped aggregation (the join key design,
    // SURVEY.md §4) — block populations and distinct-name counts.
    "dedup_blocking" -> ((s, dir) =>
      derivedPart(s, dir)
        .filter(col("base_name") =!= "")
        .groupBy("block_key")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("base_name")).as("n_names"),
          min(col("row_order")).as("min_row"))
        .orderBy("block_key"))
  )

  val oracle: Map[String, String] = Map(
    "dedup_normalize" ->
      s"""${Sql.derivedCte("part", "p_partkey", "p_name")}
         |SELECT row_order, original_name, normalized_name, base_name, block_key
         |FROM derived ORDER BY row_order""".stripMargin,

    "dedup_blocking" ->
      s"""${Sql.derivedCte("part", "p_partkey", "p_name")}
         |SELECT block_key, count(*) AS n_rows,
         |       count(DISTINCT base_name) AS n_names,
         |       min(row_order) AS min_row
         |FROM derived WHERE base_name <> ''
         |GROUP BY block_key ORDER BY block_key""".stripMargin
  )
}
