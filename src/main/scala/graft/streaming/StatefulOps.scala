package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom keyed state via flatMapGroupsWithState — the escape hatch
  * for stream logic that windowed aggregation can't express. The
  * example operator tracks a per-user running total across
  * micro-batches and emits one record each time the total crosses a
  * `step` milestone (crossings are emitted exactly once because the
  * carried state remembers the last milestone reached). */
object StatefulOps {

  case class UserEvent(user_id: Long, ts: Timestamp, value: Double)
  case class UserTotal(total: Double, n_events: Long)
  case class Milestone(user_id: Long, milestone: Long, total: Double, n_events: Long)

  /** Works on both batch Datasets and streaming Datasets (Spark runs
    * the same state function; in batch every group is one "batch"). */
  def milestones(ds: Dataset[UserEvent], step: Double)(
      implicit spark: SparkSession): Dataset[Milestone] = {
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          var st = state.getOption.getOrElse(UserTotal(0.0, 0L))
          val out = Seq.newBuilder[Milestone]
          // deterministic in-batch order regardless of shuffle arrival
          events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
            val before = math.floor(st.total / step).toLong
            st = UserTotal(st.total + e.value, st.n_events + 1)
            val after = math.floor(st.total / step).toLong
            (before + 1 to after).foreach { m =>
              out += Milestone(uid, m, st.total, st.n_events)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
