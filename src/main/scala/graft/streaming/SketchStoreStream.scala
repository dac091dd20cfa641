package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D37: the day-grain sketch store's STREAMING WRITER — the "each day's
  * ingest leaves one 29 KiB sketch behind" cadence (B55/B56's deployment
  * story, the reference's nightly scheduler analog,
  * /root/reference/app/api/scheduler_endpoints.py:19-70) executed as a
  * stream instead of a batch job.
  *
  * Each micro-batch carries one or more COMPLETE calendar days of events
  * (the daily-feed cadence ReplaySpec drives — the same contract as the
  * batch append: the swap REPLACES the day, which is also what makes a
  * restated day converge) and leaves behind exactly those days' qsketch
  * rows via [[graft.operators.SketchArtifacts.appendQsketchDay]] — the
  * replaceSlice write-new → rename publish plus the manifest re-stamp.
  *
  * Idempotence: `foreachBatch` is AT-LEAST-ONCE; a replayed epoch
  * recomputes the SAME day slices from the same batch rows, and the slice
  * swap replaces each day's directory with identical content — replay ≡
  * first write, and a streaming-built store is MANIFEST-EQUAL to the
  * batch [[graft.operators.SketchArtifacts.write]] (ReplaySpec pins it
  * through a dropped-commit-marker crash). The per-batch day list is a
  * bounded driver read (calendar days per batch, never event rows).
  *
  * Scale: per batch the work is the day slices' own aggregation (29 KiB
  * of distributive state per day) plus an O(observed days) manifest
  * re-stamp — the store stays readable by every geometry-checked
  * consumer between batches (readers see the old slice or the new,
  * never a mix). */
object SketchStoreStream {

  /** Append each micro-batch's calendar days to the qsketch_day store at
    * `root`. Input needs (ts: long nanos, value: double). */
  def qsketchDaily(events: DataFrame, root: String, checkpointDir: String,
      s: Int = graft.functions.Kernels.QSketchS,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val days = batch.select(expr("ts div 86400000000000").as("d"))
          .distinct().collect().map(_.getLong(0)).sorted
        days.foreach { d =>
          graft.operators.SketchArtifacts.appendQsketchDay(
            batch.sparkSession, root, d,
            batch.filter(expr("ts div 86400000000000") === lit(d)), s)
        }
      }
      .start()
}
