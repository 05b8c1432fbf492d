package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the full dedup pipeline (normalize → block → match →
    * cluster → elect → score) on part names. */
  def entry(spark: SparkSession): DataFrame =
    DedupQueries.queries("dedup_full")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DedupQueries.queries ++ RelationalQueries.queries ++ EventQueries.queries ++
      TextQueries.queries ++ AnnQueries.queries ++ MultimodalQueries.queries ++
      StreamingQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    DedupQueries.oracle ++ RelationalQueries.oracle ++ EventQueries.oracle ++
      TextQueries.oracle ++ AnnQueries.oracle ++ MultimodalQueries.oracle ++
      StreamingQueries.oracle
}
