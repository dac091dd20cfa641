package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D4: streaming twin of DedupOps.dedupExact — continuous exact content
  * dedup of a document stream, the online half of the reference's
  * no-duplicate-loads guarantee (/root/reference/app/services/
  * etl_service.py:252-293) applied to content instead of keys.
  *
  * Scale design: state is keyed on the 16-byte md5 of the normalized text —
  * never the text itself — so the state store holds O(distinct hashes ×
  * 16 B) regardless of document size, and
  * `dropDuplicatesWithinWatermark` lets the watermark evict hashes once no
  * late duplicate can still arrive, bounding state to the horizon instead of
  * the full history. A 100 TB/day stream dedups with per-executor state
  * proportional to the horizon's distinct-hash count only.
  */
object DedupStream {

  /** First occurrence per normalized content hash within the watermark
    * horizon. Input needs (`textCol`, `tsCol`: timestamp); emits the input
    * columns plus `norm_hash`. Works on a streaming or batch DataFrame (on
    * batch it degrades to a plain dropDuplicates on the hash). */
  def dedup(docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
            watermark: String = "10 minutes"): DataFrame = {
    val hashed = docs.withColumn("norm_hash",
      md5(lower(trim(col(textCol))).cast("binary")))
    if (docs.isStreaming)
      hashed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("norm_hash")
    else hashed.dropDuplicates("norm_hash")
  }
}
