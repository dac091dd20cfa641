package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** As-of (point-in-time) join — for each left row, the latest right row with
  * the same key and `right.time <= left.time`. The classic enrichment shape
  * (order → latest price tick, event → last heartbeat) that naive SQL
  * expresses as a correlated subquery or a range cross join.
  *
  * Spark-first design (SURVEY.md §4): composed from existing operators — no
  * custom physical plan needed. Both sides are tagged and UNIONed, then a
  * single window per key, ordered by (time, side), carries the right
  * payload forward (`last(..., ignoreNulls)` over an unbounded-preceding
  * frame); left rows read the carried value at their own position. Cost: ONE
  * shuffle on the key + one sort — linear in rows at any scale, where the
  * range-join formulation is quadratic per key. Right rows sort before left
  * rows at equal times, so the match is `<=` (ASOF semantics).
  */
object AsOf {

  /** Generic as-of join. Right payload columns (everything except `key` and
    * `rightTime`) must not clash with left column names; each left row gains
    * them, null when no right row precedes it.
    *
    * The payload is carried as ONE struct: a right row's struct is non-null
    * as a whole, so `last(..., ignoreNulls)` picks the matched row
    * atomically — per-column carries would backfill a NULL field of the
    * matched row from an OLDER row, a mixed row no right row ever
    * contained (and a divergence from ASOF semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val payload = right.schema.fields
      .filterNot(f => f.name == key || f.name == rightTime)
    val payloadType = StructType(payload)
    val rTagged = right.select(
      col(key), col(rightTime).as("_t"), lit(0).as("_side"),
      struct(payload.toIndexedSeq.map(f => col(f.name)): _*).as("_p"))
    val lTagged = left.select(
      (col(key) +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(payloadType).as("_p") +:
        left.columns.filterNot(_ == key).toIndexedSeq.map(col)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged, allowMissingColumns = true)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col("_side") === 1)) { (df, f) =>
      df.withColumn(f.name, col("_p").getField(f.name))
    }.drop("_t", "_side", "_p")
  }

  /** B11: `q_events_asof` — each error event enriched with the user's most
    * recent click at/before it (root-cause context for an error stream).
    * Event time in µs (the grain DuckDB preserves, see Etl.syncEvents). */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"),
        col("event_id").as("click_event_id"),
        col("ts_us").as("click_ts_us"), col("value").as("click_value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    asofJoin(errors, clicks, key = "user_id",
        leftTime = "ts_us", rightTime = "ts_us")
      .select("event_id", "user_id", "ts_us",
        "click_event_id", "click_ts_us", "click_value")
      .orderBy("event_id")
  }

  /** DuckDB twin — its native ASOF JOIN, the independent formulation the
    * union+window plan must match bit-for-bit. */
  val eventsAsofSql: String = """
    WITH ev AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
        event_type, value
      FROM events),
    c AS (
      SELECT user_id, ts_us AS click_ts_us, event_id AS click_event_id,
        value AS click_value
      FROM ev WHERE event_type = 'click'),
    e AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'error')
    SELECT e.event_id, e.user_id, e.ts_us,
      c.click_event_id, c.click_ts_us, c.click_value
    FROM e ASOF LEFT JOIN c
      ON e.user_id = c.user_id AND e.ts_us >= c.click_ts_us
    ORDER BY event_id"""
}
