package graft.core

import org.apache.spark.sql.DataFrame

/** Lifecycle helpers for eagerly-checkpointed DataFrames shared by the
  * iterative algorithms (connected components, Lloyd's k-means). */
object Frames {

  /** Drop the persisted blocks behind an eager `localCheckpoint` the
    * moment the frame is superseded. Left alone, checkpoint blocks
    * survive until the driver GCs the frame AND ContextCleaner runs
    * (periodic GC defaults to 30 min) — an iterative loop therefore
    * keeps O(iterations) copies of its working set resident. Harmless
    * at sf0.1; at 100 TB the superseded copies evict everything else
    * in the storage pool. Unpersist is idempotent and non-blocking; a
    * frame that isn't checkpoint-backed is left untouched. Spark logs
    * a WARN per unpersisted checkpoint ("lineage has been truncated
    * and cannot be recomputed") — benign by construction: release is
    * only called on frames whose last reader has finished. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        scala.util.Try(lr.rdd.unpersist(false))
      case _ => ()
    }
}
