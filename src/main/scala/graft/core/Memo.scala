package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Per-session memoization of expensive shared intermediates (the
  * dedup pipeline table, LSH signature index, …). Reports over the
  * same pipeline then cost one materialization instead of N — the
  * DataFrame analogue of a materialized view. Entries are keyed by
  * session IDENTITY (reference equality, not a hash that could
  * collide after GC), so two sessions can never cross-hit, and cached
  * via Spark's storage layer, so memory pressure falls back to
  * recompute, never OOM. Entries owned by a stopped session are
  * pruned on the next access from ANY session — cached()/size/
  * invalidate all sweep first — their cached blocks are already gone
  * with the context, so the sweep only drops driver-side references.
  * [[invalidate]] releases a live session's entries eagerly;
  * long-lived hosts that stop sessions should call
  * `Memo.invalidate(spark)` before `spark.stop()` so the driver-side
  * references go with the session rather than waiting for the next
  * Memo access. */
object Memo {
  /** Session key with reference equality — unlike
    * System.identityHashCode alone, equal hash never conflates two
    * distinct live sessions. */
  private final class SessionKey(val s: SparkSession) {
    override def hashCode: Int = System.identityHashCode(s)
    override def equals(o: Any): Boolean = o match {
      case k: SessionKey => k.s eq s
      case _ => false
    }
  }
  private val memo = mutable.Map.empty[(SessionKey, String), DataFrame]

  private def prune(): Unit =
    memo.filterInPlace { case ((k, _), _) => !k.s.sparkContext.isStopped }

  def cached(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame = synchronized {
    prune()
    memo.getOrElseUpdate((new SessionKey(spark), key), build.cache())
  }

  /** Unpersist and drop every entry owned by `spark`. Safe to call on
    * a stopped session (entries are just dropped). */
  def invalidate(spark: SparkSession): Unit = synchronized {
    prune()
    memo.filterInPlace { case ((k, _), df) =>
      if (k.s eq spark) {
        if (!spark.sparkContext.isStopped) df.unpersist()
        false
      } else true
    }
  }

  /** Number of live entries (test hook). */
  def size: Int = synchronized { prune(); memo.size }
}
