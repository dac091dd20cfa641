package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Banded range join — pairs of rows with the same key whose times lie
  * within a window (0 < t_b − t_a ≤ W). Naive SQL expresses this as an
  * inequality join, which Spark plans as a per-key cross join (quadratic in
  * the hot key). Banding restores an EQUI-join: each row gets an integer
  * time bucket of width W; a qualifying pair's buckets differ by at most 1
  * (since Δ ≤ W), so joining the left bucket against the right row exploded
  * into {bucket, bucket−1} finds every pair exactly once, and the exact
  * window predicate filters the candidates. Cost: one shuffle on
  * (key, bucket), candidates bounded by per-bucket volume — linear-ish at
  * any scale, never corpus² per key.
  */
object RangeJoin {

  /** Generic banded pair join: (key, id_a, id_b, delta) for every ordered
    * pair with equal `key` and 0 < delta = t_b − t_a ≤ `window` (in the
    * time column's own unit, which must be an integral type). */
  def windowPairs(df: DataFrame, key: String, time: String, id: String,
                  window: Long): DataFrame = {
    val base = df.select(col(key), col(time), col(id))
    val a = base.select(col(key), col(time).as("_t_a"), col(id).as("id_a"))
      .withColumn("_bucket", expr(s"_t_a div $window"))
    val b = base.select(col(key), col(time).as("_t_b"), col(id).as("id_b"))
      .withColumn("_bucket",
        explode(array(expr(s"_t_b div $window"), expr(s"_t_b div $window - 1"))))
    a.join(b, Seq(key, "_bucket"))
      .filter(col("_t_b") > col("_t_a") && col("_t_b") - col("_t_a") <= window)
      .select(col(key), col("id_a"), col("id_b"),
        (col("_t_b") - col("_t_a")).as("delta"))
  }

  /** B12: `q_events_range_join` — co-occurring event pairs: same user,
    * second event within 60 s of the first (burst/co-click analysis). */
  def eventsWindowPairs(spark: SparkSession, dir: String,
      windowUs: Long = 60000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"))
    windowPairs(ev, "user_id", "ts_us", "event_id", windowUs)
      .select(col("user_id"), col("id_a").as("event_a"),
        col("id_b").as("event_b"), col("delta").as("delta_us"))
      .orderBy("event_a", "event_b")
  }

  /** DuckDB twin — the plain inequality join (DuckDB's IEJoin handles it),
    * an independent formulation the banded plan must match bit-for-bit. */
  val eventsWindowPairsSql: String = """
    WITH e AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id
      FROM events)
    SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
      b.ts_us - a.ts_us AS delta_us
    FROM e a JOIN e b ON a.user_id = b.user_id AND b.ts_us > a.ts_us
      AND b.ts_us - a.ts_us <= 60000000
    ORDER BY event_a, event_b"""
}
