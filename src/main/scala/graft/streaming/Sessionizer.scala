package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user event for sessionization. `ts` is the event time; money stays in
  * integer cents, matching the batch twin Analytics.sessionize. */
case class SessEvent(user_id: Long, ts: Timestamp, val_c: Long)

/** Open-session state carried across micro-batches (micros since epoch). */
case class OpenSession(start_us: Long, end_us: Long, n: Long, val_c: Long)

/** A closed session. */
case class SessionOut(user_id: Long, inicio_us: Long, fin_us: Long,
                      n_eventos: Long, valor_total: Double)

/** D2: gap-based sessionization via `flatMapGroupsWithState` — the custom-
  * state streaming twin of Analytics.sessionize (SURVEY.md §2 B9/D2).
  *
  * State per user is ONE open session (4 longs) — O(active users) total,
  * independent of history length. A session closes when a later event
  * arrives more than `gapUs` after it ends, or — in streaming — when the
  * event-time watermark passes its end + gap (EventTimeTimeout: timeouts
  * advance with data, so idle topics cost zero micro-batches, unlike
  * processing-time timeouts which force continuous empty batches purely to
  * poll the clock).
  *
  * The same function body also runs in batch mode (Spark calls it once per
  * group, no state retained), where `finishAll = true` also emits the
  * trailing open session — the spec compares that against the batch twin.
  */
object Sessionizer {
  val DefaultGapUs: Long = 30L * 60 * 1000000L

  private def usOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** Split one user's time-sorted events into gap-separated sessions. */
  private def fold(user: Long, sorted: Seq[SessEvent], open: Option[OpenSession],
                   gapUs: Long): (Vector[SessionOut], Option[OpenSession]) = {
    var cur = open
    var out = Vector.empty[SessionOut]
    sorted.foreach { e =>
      val us = usOf(e.ts)
      cur match {
        case Some(s) if us - s.end_us <= gapUs =>
          cur = Some(OpenSession(s.start_us, us, s.n + 1, s.val_c + e.val_c))
        case Some(s) =>
          out :+= SessionOut(user, s.start_us, s.end_us, s.n, s.val_c / 100.0)
          cur = Some(OpenSession(us, us, 1L, e.val_c))
        case None =>
          cur = Some(OpenSession(us, us, 1L, e.val_c))
      }
    }
    (out, cur)
  }

  private def sessionFunc(gapUs: Long, finishAll: Boolean)(
      user: Long, events: Iterator[SessEvent],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // watermark passed end-of-session + gap: close and emit
      val s = state.get
      state.remove()
      Iterator.single(SessionOut(user, s.start_us, s.end_us, s.n, s.val_c / 100.0))
    } else {
      // micro-batches deliver events unsorted — sort by (ts, val_c tie-break)
      val sorted = events.toVector.sortBy(e => (usOf(e.ts), e.val_c))
      val (closed, open) = fold(user, sorted, state.getOption, gapUs)
      open match {
        case Some(s) if finishAll =>
          state.remove()
          (closed :+ SessionOut(user, s.start_us, s.end_us, s.n, s.val_c / 100.0)).iterator
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp((s.end_us + gapUs) / 1000) // event-time ms
          closed.iterator
        case None =>
          if (state.exists) state.remove()
          closed.iterator
      }
    }
  }

  /** Streaming (or batch, with finishAll=true) sessionize. Append-mode.
    * Streaming input must carry a watermark on `ts` (see [[withWatermark]]). */
  def sessionize(events: Dataset[SessEvent], gapUs: Long = DefaultGapUs,
                 finishAll: Boolean = false): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[OpenSession]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        if (finishAll) GroupStateTimeout.NoTimeout
        else GroupStateTimeout.EventTimeTimeout)(
        sessionFunc(gapUs, finishAll))
  }

  /** Convenience: apply the event-time watermark the streaming path needs. */
  def withWatermark(events: Dataset[SessEvent], delay: String = "30 minutes"): Dataset[SessEvent] = {
    implicit val enc = Encoders.product[SessEvent]
    events.withWatermark("ts", delay).as[SessEvent]
  }
}
