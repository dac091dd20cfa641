package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D32: streaming RRF retrieval serving — C96's continuous-query shape:
  * the two ANN indexes (sign-LSH buckets + IVF cells) are derived from a
  * FROZEN corpus (production: last night's index build), and probe
  * vectors arrive as a stream; each micro-batch's probes get their fused
  * top-10 ([[graft.operators.EmbeddingOps.retrievalRrfServe]]) written to
  * the serving sink. This is the retrieval half of a RAG loop run as a
  * standing query instead of a request/response service — the same plan,
  * the same arithmetic, just driven by arrival.
  *
  * Stateless by construction (the D19 pattern): the corpus relation is
  * static, every window/join completes inside the micro-batch (probe
  * sides broadcast — bounded by arrival), and no state store entry
  * outlives the batch. Index refresh is a batch-side rebuild + corpus
  * swap, exactly as D19 models codebook retraining.
  *
  * Idempotence: `foreachBatch` is AT-LEAST-ONCE, so the write is
  * `batch_id`-partitioned with dynamic partition overwrite (the D24
  * pattern): a replayed epoch rewrites exactly its own `batch_id=N`
  * directory — replay ≡ first write, pinned by a dropped-commit-marker
  * recovery spec. */
object AnnStream {

  /** Continuous fused-top-10 serving of a probe stream (probe_id,
    * embedding) against a frozen corpus relation (vec_id, embedding). */
  def serve(probes: DataFrame, corpus: DataFrame, targetDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    probes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        graft.operators.EmbeddingOps.retrievalRrfServe(corpus, batch)
          .withColumn("batch_id", lit(epoch))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(targetDir)
      }
      .start()
}
