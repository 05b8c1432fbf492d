package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver testdata layout
  * (`TESTDATA.md`): one parquet file per table under an sf directory.
  * Columnar parquet scans give Catalyst pushdown + pruning for free —
  * every query should show `PushedFilters`/narrow `ReadSchema` in
  * `.explain`. */
object Tables {
  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  /** The driver's events.parquet stores `ts` as INT64
    * TIMESTAMP(NANOS) which Spark has no native type for — read it as
    * raw nanos (legacy conf) and convert to a microsecond timestamp
    * (floor division, matching DuckDB's ns→µs truncation). Scaled-up
    * copies (tools.ScaleUp) already store native µs timestamps, so
    * the conversion is dtype-conditional. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
