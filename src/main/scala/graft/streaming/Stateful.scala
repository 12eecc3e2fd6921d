package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class UserEvent(user_id: Long, ts: java.sql.Timestamp)
case class UserRunningCount(user_id: Long, n_events: Long)
case class AdmitEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp, cents: Long)
case class Admitted(event_id: Long, user_id: Long, cents: Long, cum_before: Long)

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
  implicit val admitEventEnc: Encoder[AdmitEvent] = Encoders.product[AdmitEvent]
  implicit val admittedEnc: Encoder[Admitted] = Encoders.product[Admitted]

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

  /** Streaming twin of q_stream_admit (EventWindows.budgetAdmitted):
    * admit events per user while the EXCLUSIVE running value total is
    * under budget, carrying one Long of state per user across
    * microbatches. Values are integer cents — exact arithmetic, so the
    * admission boundary can never flip on a float ulp (the batch twin
    * and the DuckDB oracle make the same conversion).
    *
    * Within a batch the group iterator is UNORDERED — the function
    * imposes (ts, event_id) order in-memory per group per batch (a
    * group's batch slice, not the stream, bounds that sort). Across
    * batches admission is arrival-order: with in-order delivery the
    * result equals the batch twin (StreamingSpec pins that parity);
    * out-of-order delivery admits in arrival order by design — the
    * operator is an admission CONTROLLER, not a retroactive sort. The
    * accumulated total keeps counting after the budget is hit, so a
    * key's state stays one monotone Long forever; at real scale use
    * [[budgetAdmitEvicting]], which bounds state by evicting keys
    * idle past the event-time horizon (StreamingSpec pins the
    * eviction).
    */
  def budgetAdmit(events: Dataset[AdmitEvent], budgetCents: Long): Dataset[Admitted] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[AdmitEvent], state: GroupState[Long]) => {
          // Full-precision order: getTime() alone truncates to millis
          // (micros live in the Timestamp's nanos field), so two
          // same-millisecond events would tie-break by event_id here
          // while the batch twin and the oracle order by the real
          // microsecond timestamp.
          val sorted = evs.toArray
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var cum = state.getOption.getOrElse(0L)
          val out = Array.newBuilder[Admitted]
          sorted.foreach { e =>
            if (cum < budgetCents) out += Admitted(e.event_id, uid, e.cents, cum)
            cum += e.cents
          }
          state.update(cum)
          out.result().iterator
        })
  }

  /** Default idle horizon for [[budgetAdmitEvicting]]: a key whose
    * last event time falls this far behind the watermark is dropped.
    */
  val IdleHorizonMs: Long = 30L * 60 * 1000

  /** [[budgetAdmit]] with BOUNDED state — the 100 TB contract. The
    * unbounded-state variant keeps one Long per user forever, which
    * on an open-ended key domain (users, sessions, documents) is the
    * streaming OOM: state grows with the lifetime key count, not the
    * active set. This twin sets a watermark on event time and an
    * EventTimeTimeout per key at (last event time + `idleHorizonMs`):
    * once the watermark passes that point the key's callback fires
    * with `hasTimedOut`, the state is REMOVED, and nothing is
    * emitted — so resident state is O(keys active within the
    * horizon). The cost is semantic and explicit: a key returning
    * after the horizon restarts its budget from zero (its running
    * total was evicted), which is the standard trade for bounded
    * state; StreamingSpec pins both sides (idle key evicted and
    * restarted at cum 0, active key's total carried).
    *
    * The timeout timestamp is clamped one past the current watermark:
    * setTimeoutTimestamp rejects values at or before the watermark,
    * and a batch CAN legally arrive carrying only events older than
    * (watermark − horizon) for a key the watermark has already moved
    * far beyond.
    */
  def budgetAdmitEvicting(events: Dataset[AdmitEvent], budgetCents: Long,
      watermarkDelay: String = "10 minutes",
      idleHorizonMs: Long = IdleHorizonMs): Dataset[Admitted] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[AdmitEvent], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = evs.toArray
              .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            var cum = state.getOption.getOrElse(0L)
            val out = Array.newBuilder[Admitted]
            sorted.foreach { e =>
              if (cum < budgetCents) out += Admitted(e.event_id, uid, e.cents, cum)
              cum += e.cents
            }
            state.update(cum)
            val lastTs = sorted.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastTs + idleHorizonMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
        })
  }
}
