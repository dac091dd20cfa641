package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D27: streaming decontamination gate — C84's Bloom screen in its DEPLOYED
  * shape: incoming documents are screened per micro-batch against a FROZEN
  * Bloom filter (trained batch-side by `Pipeline.bloomBuild` over the
  * benchmark corpus — in production the filter last night's eval-prep job
  * wrote) plus the exact benchmark gram set as a static relation for the
  * confirm join. This is how benchmark decontamination runs in continuous
  * ingest: the benchmark suite does NOT update with the stream, so the gate
  * is STATELESS — each doc's grams explode, probe the 32 KiB filter inside
  * the scan (no join, no shuffle for the clean bulk), only Bloom survivors
  * reach the stream-static confirm join, and every verdict completes inside
  * its micro-batch. No state store entry outlives the batch (state O(0)).
  *
  * Vehicle: `foreachBatch` running the SAME `Pipeline.bloomScreen` plan as
  * batch C84 (single-batch union ≡ batch verdicts is spec-pinned).
  * Idempotence: the per-epoch write is partitioned by `batch_id` with
  * dynamic partition overwrite scoped to this writer (the D24 pattern) —
  * an at-least-once replay rewrites exactly its own epoch directory.
  */
object BloomGateStream {

  /** Start the gate: screens `docs` (doc_id, source, text) micro-batches,
    * appends per-doc verdicts (doc_id, source, n_hits, contaminated,
    * batch_id) under `targetDir`. */
  def gate(docs: DataFrame, benchGrams: DataFrame, words: Array[Long],
           targetDir: String, checkpointDir: String,
           trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        graft.operators.Pipeline.bloomScreen(batch, benchGrams, words)
          .withColumn("batch_id", lit(epoch))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(targetDir)
      }
      .start()
}
