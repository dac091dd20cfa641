package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One attribute-change event for the SCD2 stream. */
case class ChangeEvent(user_id: Long, ts: Timestamp, event_id: Long, valor: Double)

/** The open (current) version carried across micro-batches. */
case class OpenVersion(version: Long, event_id: Long, from_us: Long, valor: Double)

/** A versioned SCD2 row. `valid_to_us` is None for the open current version
  * (only emitted in batch mode — an append-mode stream cannot retract). */
case class VersionOut(user_id: Long, version: Long, event_id: Long,
                      valor: Double, valid_from_us: Long,
                      valid_to_us: Option[Long], is_current: Boolean)

/** D6: continuous SCD2 history build via `flatMapGroupsWithState` — the
  * streaming twin of Etl.scd2History (SURVEY.md §2 A10/D6).
  *
  * State per user is ONE open version (4 fields) — O(active users), never
  * O(history): a version row is emitted the moment the NEXT change event
  * closes it, carrying its [valid_from, valid_to) interval. The open
  * current version stays in state (append-mode streams cannot retract a
  * row, so "current" lives in the state store / compacted sink, exactly
  * how a warehouse keeps the SCD2 current partition hot). In batch mode
  * (`finishAll = true`) the trailing open version IS emitted with
  * `valid_to_us = None` — the spec pins that output to the batch twin.
  *
  * Late events: the stream assumes per-user event-time order within the
  * watermark (micro-batches sort their slice; a cross-batch late arrival
  * would need a versions-rewrite compaction downstream, same as any
  * streaming SCD2). Versions number from 1 in arrival order.
  */
object Scd2Stream {

  private def usOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  private def scd2Func(finishAll: Boolean)(
      user: Long, events: Iterator[ChangeEvent],
      state: GroupState[OpenVersion]): Iterator[VersionOut] = {
    // micro-batches deliver unsorted — event-time order with id tie-break
    val sorted = events.toVector.sortBy(e => (usOf(e.ts), e.event_id))
    var cur = state.getOption
    var out = Vector.empty[VersionOut]
    sorted.foreach { e =>
      val us = usOf(e.ts)
      cur match {
        case Some(v) =>
          out :+= VersionOut(user, v.version, v.event_id, v.valor,
            v.from_us, Some(us), is_current = false)
          cur = Some(OpenVersion(v.version + 1, e.event_id, us, e.valor))
        case None =>
          cur = Some(OpenVersion(1L, e.event_id, us, e.valor))
      }
    }
    cur match {
      case Some(v) if finishAll =>
        if (state.exists) state.remove()
        (out :+ VersionOut(user, v.version, v.event_id, v.valor,
          v.from_us, None, is_current = true)).iterator
      case Some(v) =>
        state.update(v)
        out.iterator
      case None => out.iterator
    }
  }

  /** Streaming (or batch, with finishAll=true) SCD2 build. Append-mode. */
  def scd2(events: Dataset[ChangeEvent],
           finishAll: Boolean = false): Dataset[VersionOut] = {
    implicit val outEnc = Encoders.product[VersionOut]
    implicit val stEnc = Encoders.product[OpenVersion]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(scd2Func(finishAll))
  }

  /** Convenience: the event-time watermark a streaming source should carry. */
  def withWatermark(events: Dataset[ChangeEvent],
                    delay: String = "1 hour"): Dataset[ChangeEvent] = {
    implicit val enc = Encoders.product[ChangeEvent]
    events.withWatermark("ts", delay).as[ChangeEvent]
  }
}
