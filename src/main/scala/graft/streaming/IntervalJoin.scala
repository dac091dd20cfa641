package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D5: stream-stream interval join — the streaming twin of the batch
  * banded range join ([[graft.operators.RangeJoin]]): pair each left event
  * with the same user's right events arriving within `windowSec` AFTER it,
  * continuously.
  *
  * Spark-first: this is Structured Streaming's native stream-stream inner
  * join with an event-time range condition. The watermarks plus the range
  * predicate bound the join state on BOTH sides — the left buffers at most
  * `windowSec` + watermark of history, the right only the watermark — so a
  * 1000-executor deployment holds O(window) state per key, never O(stream).
  * State keys on (user_id ⨝ time-range), sharded by the stream's shuffle
  * partitioning; no driver-side loops.
  */
object IntervalJoin {

  /** Join two event streams (columns: user_id, ts: timestamp, event_id) on
    * same user with 0 < ts_b − ts_a ≤ windowSec. Works on batch or
    * streaming inputs with identical semantics, so the spec can assert the
    * batch twin's result on the same data. */
  def pairs(left: DataFrame, right: DataFrame, windowSec: Long,
            watermark: String = "10 minutes"): DataFrame = {
    val a = left.withWatermark("ts", watermark)
      .select(col("user_id").as("u_a"), col("ts").as("ts_a"),
        col("event_id").as("event_a"))
    val b = right.withWatermark("ts", watermark)
      .select(col("user_id").as("u_b"), col("ts").as("ts_b"),
        col("event_id").as("event_b"))
    a.join(b,
      col("u_a") === col("u_b") &&
        col("ts_b") > col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("u_a").as("user_id"), col("event_a"), col("event_b"),
        (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("delta_us"))
  }
}
