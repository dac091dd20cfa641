package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user event for transition counting. */
case class TransEvent(user_id: Long, ts: Timestamp, event_type: String)

/** Last-seen event per user, carried across micro-batches (µs + type). */
case class LastEvent(ts_us: Long, event_type: String)

/** One observed transition step. Downstream aggregates count these into
  * the (cur, next) matrix — emitting steps (not counts) keeps the state
  * function append-only, so transition counting composes with any
  * windowed/sketched aggregation the consumer wants. */
case class TransStep(user_id: Long, cur: String, next: String)

/** D9: streaming twin of Analytics.eventsMarkov (B31) — continuous
  * first-order transition extraction over a clickstream: for each user the
  * state is ONE last-seen event (a long + a type string, O(active users)
  * total), and every arriving event emits the step (last → current).
  * Feeding the steps to `groupBy(cur, next).count()` maintains the same
  * transition matrix the batch twin computes in one pass.
  *
  * Same ordering contract as the batch twin: per-user event times are
  * unique, and micro-batches may deliver a batch's events unsorted (sorted
  * here) but cross-batch arrival must respect event time for a user —
  * the idle-user state is evicted once the event-time watermark passes its
  * last event plus `idleUs` (EventTimeTimeout, so idle topics cost no
  * empty micro-batches), which is also the bound on reordering tolerance.
  */
object MarkovStream {
  /** Evict a user's last-event state after this much event-time idleness —
    * a user returning later simply starts a new chain, exactly like a new
    * user. Bounds state to ACTIVE users at 100 TB stream length. */
  val DefaultIdleUs: Long = 24L * 3600 * 1000000L

  private def usOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  private def stepFunc(idleUs: Long, withTimeout: Boolean)(
      user: Long, events: Iterator[TransEvent],
      state: GroupState[LastEvent]): Iterator[TransStep] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = events.toVector.sortBy(e => usOf(e.ts))
      var last = state.getOption
      val out = Vector.newBuilder[TransStep]
      sorted.foreach { e =>
        last.foreach(l => out += TransStep(user, l.event_type, e.event_type))
        last = Some(LastEvent(usOf(e.ts), e.event_type))
      }
      last.foreach { l =>
        state.update(l)
        if (withTimeout) state.setTimeoutTimestamp((l.ts_us + idleUs) / 1000)
      }
      out.result().iterator
    }
  }

  /** Streaming (or batch, with withTimeout=false) transition-step
    * extraction. Append-mode. Batch execution has no watermark, so arming
    * an event-time timeout there throws — batch callers disable it (steps
    * are already fully emitted; there is no trailing state to flush). */
  def steps(events: Dataset[TransEvent], idleUs: Long = DefaultIdleUs,
            withTimeout: Boolean = true): Dataset[TransStep] = {
    implicit val outEnc = Encoders.product[TransStep]
    implicit val stEnc = Encoders.product[LastEvent]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        if (withTimeout) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(stepFunc(idleUs, withTimeout))
  }

  /** Convenience: the event-time watermark the streaming path needs. */
  def withWatermark(events: Dataset[TransEvent],
                    delay: String = "1 hour"): Dataset[TransEvent] = {
    implicit val enc = Encoders.product[TransEvent]
    events.withWatermark("ts", delay).as[TransEvent]
  }
}
