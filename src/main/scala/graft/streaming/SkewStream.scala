package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D33: streaming twin of Skew.skewAudit (C102) — a continuous HOT-KEY
  * TRIPWIRE over a keyed event stream: per tumbling window, the keys whose
  * row count crosses an absolute threshold, emitted the moment the
  * watermark closes the window. The batch audit (C102) is the planning
  * read — ranked keys, shares, skew factors over the whole table; this is
  * the alarm that fires DURING the flood (a bot user, a null-ish sentinel
  * id, a replayed feed) while the partition it would melt is still being
  * written.
  *
  * Why an absolute threshold and not a share: the batch report's
  * `skew_x`/`key_share` divide by the family totals, and a streaming
  * share would be an aggregate over an aggregate — unsupported in a
  * single Structured Streaming query and semantically murky mid-window.
  * Operationally the tripwire wants absolute units anyway: "no key may
  * exceed N rows per window" is how a partition budget is actually
  * expressed (N rows ≈ the task-memory bound saltedAgg exists to dodge).
  *
  * State: O(open windows × keys active in them), watermark-evicted —
  * never O(key history). The filter runs AT the aggregate, so only
  * crossing keys ever leave the state store. Append mode: each alert is
  * emitted exactly once, when its window closes.
  */
object SkewStream {

  /** Tumbling-window hot-key alerts. Input needs (ts: timestamp, key);
    * works on a streaming or batch DataFrame (batch twin: the identical
    * expression with the watermark a no-op), so specs drive both from the
    * same rows. */
  def hotKeyAlerts(keyed: DataFrame, threshold: Long,
                   window_ : String = "10 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    require(threshold > 0, s"alert threshold must be positive, got $threshold")
    keyed
      .withWatermark("ts", watermark)
      .select(window(col("ts"), window_).as("win"), col("key"))
      .groupBy("win", "key")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"), col("key"), col("n"))
  }
}
