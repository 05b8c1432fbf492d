package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous counterpart of the
  * batch `text_exact_dedup` hash-groupBy. State is bounded by the
  * watermark: a duplicate arriving within the delay of its first
  * occurrence is dropped; older state is reclaimed (the only way
  * streaming dedup stays O(window) instead of O(history) at scale). */
object StreamDedup {

  /** Drop records whose `textCol` content was already seen within the
    * watermark window. `tsCol` must be an event-time column. */
  def exactDedup(stream: DataFrame, textCol: String, tsCol: String = "ts",
      delay: String = "1 hour"): DataFrame =
    stream
      .withColumn("content_hash", md5(col(textCol).cast("string")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
}
