package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One pre-bucketed event observation: the hour id is `ts_ns div 3600e9`,
  * computed upstream exactly like the batch twin's hourly bucketing. */
case class HourEvent(event_type: String, hora_epoch: Long)

/** Per-type running state: hourly counts plus a revision counter so
  * consumers (and specs) can identify each emission generation. */
case class HourCounts(counts: Map[Long, Long], rev: Long)

/** One anomaly verdict row. `z`/`anomalo` are None while the type has zero
  * variance (a single hour, or a perfectly flat rate) — same NULL contract
  * as the batch twin. */
case class AnomalyRow(event_type: String, hora_epoch: Long, n: Long,
                      media_h: Double, z: Option[Double],
                      anomalo: Option[Boolean], rev: Long)

/** D11: streaming twin of Analytics.eventsAnomaly (B26) — a continuously
  * maintained hourly event-rate anomaly report per event type (the alerting
  * face of the batch QA report; the reference's scheduler monitoring,
  * /root/reference/app/api/scheduler_endpoints.py, is the same loop run by
  * cron).
  *
  * State per type is the hourly count map plus a revision counter —
  * calendar-bounded (hours per year × types), NEVER event-volume-bounded:
  * each arriving event increments one map cell. Every micro-batch re-emits
  * the full per-type report (Update mode) with a bumped `rev`, so the
  * latest generation is always identifiable downstream.
  *
  * Exactness contract with the batch twin: the moments are EXACT integer
  * sums (Σn, Σn² over hourly counts — summing longs is order-independent),
  * and the derived mean/variance/z use the identical double operation
  * order, so after the final micro-batch the max-rev rows equal the batch
  * twin's output bit-for-bit (spec-pinned).
  */
object AnomalyStream {

  /** Recompute the report rows for one type from its counts map. */
  private def report(typ: String, counts: Map[Long, Long],
                     rev: Long): Iterator[AnomalyRow] = {
    val nHoras = counts.size.toLong
    var sumN = 0L; var sumN2 = 0L
    counts.valuesIterator.foreach { n => sumN += n; sumN2 += n * n }
    val media = sumN.toDouble / nHoras.toDouble
    val varianza = sumN2.toDouble / nHoras.toDouble - media * media
    counts.toSeq.sortBy(_._1).iterator.map { case (h, n) =>
      val z = if (varianza > 0) Some((n.toDouble - media) / math.sqrt(varianza))
              else None
      AnomalyRow(typ, h, n, media, z,
        z.map(v => math.abs(v) > graft.operators.Analytics.AnomalyZ), rev)
    }
  }

  private def updateFunc(typ: String, events: Iterator[HourEvent],
      state: GroupState[HourCounts]): Iterator[AnomalyRow] = {
    val prev = state.getOption.getOrElse(HourCounts(Map.empty, 0L))
    val counts = events.foldLeft(prev.counts) { (m, e) =>
      m.updated(e.hora_epoch, m.getOrElse(e.hora_epoch, 0L) + 1L)
    }
    val rev = prev.rev + 1
    state.update(HourCounts(counts, rev))
    report(typ, counts, rev)
  }

  /** Running anomaly report over a (streaming or batch) HourEvent set.
    * Update-mode emissions; consumers keep the max-rev generation per
    * type. In batch execution this degenerates to one generation (rev=1)
    * that equals the batch twin's report. */
  def rows(events: Dataset[HourEvent]): Dataset[AnomalyRow] = {
    implicit val outEnc = Encoders.product[AnomalyRow]
    implicit val stEnc = Encoders.product[HourCounts]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateFunc)
  }
}
