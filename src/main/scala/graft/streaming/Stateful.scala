package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class UserEvent(user_id: Long, ts: java.sql.Timestamp)
case class UserRunningCount(user_id: Long, n_events: Long)

/** [EXT] Custom streaming state via `flatMapGroupsWithState` — the
  * hook for semantics the built-in windows can't express. The example
  * keeps one Long of state per user (a running event count emitted on
  * every update); at scale state lives in the state store partitioned
  * by group key, and the update function sees only one group per call,
  * so memory is O(groups per partition), never O(stream).
  *
  * Built-in operators remain the default (SURVEY §7: session windows
  * use `session_window`, dedup uses `dropDuplicatesWithinWatermark`);
  * this is the escape hatch, kept deliberately minimal.
  */
object Stateful {

  implicit val userEventEnc: Encoder[UserEvent] = Encoders.product[UserEvent]
  implicit val userCountEnc: Encoder[UserRunningCount] = Encoders.product[UserRunningCount]

  def runningUserCounts(events: Dataset[UserEvent]): Dataset[UserRunningCount] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          Iterator(UserRunningCount(uid, n))
        })
  }
}
