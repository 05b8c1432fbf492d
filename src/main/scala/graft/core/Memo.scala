package graft.core

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Per-session memoization of expensive shared intermediates (the
  * dedup pipeline table, LSH signature index, …). Reports over the
  * same pipeline then cost one materialization instead of N — the
  * DataFrame analogue of a materialized view. Entries are keyed by
  * (session id, cache key) and cached via Spark's storage layer, so
  * memory pressure falls back to recompute, never OOM. */
object Memo {
  private val memo = mutable.Map.empty[(String, String), DataFrame]

  def cached(spark: org.apache.spark.sql.SparkSession, key: String)(
      build: => DataFrame): DataFrame = synchronized {
    memo.getOrElseUpdate((String.valueOf(System.identityHashCode(spark)), key),
      build.cache())
  }
}
