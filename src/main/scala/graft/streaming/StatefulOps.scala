package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over an unbounded stream via
  * KeyValueGroupedDataset.flatMapGroupsWithState — the extension point for
  * semantics the built-in windows can't express. State is per-key, stored
  * in the state store (checkpointed, bounded by explicit timeouts), so the
  * operator scales by key partitioning like every other keyed op.
  *
  * The reference's only state is the unacked map
  * (/root/reference/common/unacked.go); this generalizes that pattern:
  * track per-key progress and emit on change, expiring idle keys.
  */
object StatefulOps {

  final case class KeyedEvent(key: Long, ts: Timestamp, value: Double)

  final case class KeyProgress(
      key: Long,
      events: Long, // events seen so far
      total: Double, // running value sum
      lastTs: Timestamp, // most recent event time
      expired: Boolean) // true on the timeout-emitted final record

  /** Internal state record (public: encoder codegen requires accessible
    * accessors).
    */
  final case class St(events: Long, total: Double, lastMs: Long)

  /** Per-key running (count, sum) emitted on every update; a key whose
    * last event is older than `idleMs` of EVENT time when the watermark
    * passes emits one final `expired = true` record and its state is
    * dropped — bounded state on an unbounded key space, which a naive
    * groupBy can't do. Event-time (not processing-time) timeout on
    * purpose: processing-time timeouts force the engine into continuous
    * empty timeout-check batches; event-time expiry advances with the
    * watermark like every other streaming state here.
    */
  def runningTotals(events: Dataset[KeyedEvent], idleMs: Long,
      lateness: String = "10 minutes"): Dataset[KeyProgress] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[KeyProgress]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[St]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(KeyProgress(key, st.events, st.total,
              new Timestamp(st.lastMs), expired = true))
          } else {
            val prev = state.getOption.getOrElse(St(0L, 0.0, 0L))
            val batch = rows.toSeq
            val st = St(
              prev.events + batch.size,
              prev.total + batch.map(_.value).sum,
              math.max(prev.lastMs, batch.map(_.ts.getTime).max))
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + idleMs)
            Iterator.single(KeyProgress(key, st.events, st.total,
              new Timestamp(st.lastMs), expired = false))
          }
        })
  }
}
