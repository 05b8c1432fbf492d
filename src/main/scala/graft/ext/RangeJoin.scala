package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — for each left row, the right rows of the
  * same key whose timestamp falls in
  * `[left.ts - lowerSec, left.ts + upperSec]`. Spark has no native
  * range-join operator: the naive formulation is a non-equi join that
  * the planner can only run as a (broadcast) nested-loop — O(|L|·|R|)
  * per key and a scale-killer.
  *
  * Scale shape: quantize time into buckets of width = the range span,
  * fan the LEFT side out to every bucket its window can touch (≤ 2
  * buckets when the width equals the span), and equi-join on
  * (keys…, bucket) with the exact range as a residual filter. The
  * join shuffles and parallelizes like any hash join — each right row
  * is examined only by left rows in adjacent buckets, never the whole
  * key group. This is the standard interval-bucketing decomposition
  * used by stream processors for interval joins.
  *
  * Buckets are computed from second-truncated times (the bucket id
  * only needs to be consistent, not exact — truncation keeps it an
  * integer) but the residual filter runs on the RAW timestamp
  * columns, so containment in `[left.ts - lowerSec, left.ts +
  * upperSec]` is exact at full timestamp precision. Coverage still
  * holds under truncation: floor is monotone, so a right row inside
  * the raw window has `floor(epoch(rightTs)) ∈ [floor(epoch(leftTs))
  * - lowerSec, floor(epoch(leftTs)) + upperSec]`, which is exactly
  * the bucket range the left side fans out to. */
object RangeJoin {

  /** @param left     probe side
    * @param right    build side
    * @param keyCols  equi-key columns present on both sides
    * @param leftTs   left event-time column (timestamp)
    * @param rightTs  right event-time column (timestamp)
    * @param lowerSec seconds before `leftTs` (inclusive bound)
    * @param upperSec seconds after `leftTs` (inclusive bound)
    * @return one row per (left row, matching right row); right's
    *         non-key columns keep their names (caller projects) */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long): DataFrame = {
    require(lowerSec + upperSec > 0, "empty range")
    require(leftTs != rightTs,
      "rename one timestamp column first (both sides in one output)")
    val width = lowerSec + upperSec
    def bucketOf(ts: Column): Column = floor(unix_timestamp(ts) / width)
    val l = left.withColumn("_bucket",
      explode(sequence(
        floor((unix_timestamp(col(leftTs)) - lowerSec).cast("double") / width).cast("long"),
        floor((unix_timestamp(col(leftTs)) + upperSec).cast("double") / width).cast("long"))))
    val r = right.withColumn("_bucket", bucketOf(col(rightTs)).cast("long"))
    l.join(r, keyCols :+ "_bucket")
      .where(col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerSec SECONDS") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperSec SECONDS"))
      .drop("_bucket")
  }
}
