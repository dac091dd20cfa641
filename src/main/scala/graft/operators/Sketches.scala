package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Mergeable sketches and bounded-output summaries (SURVEY.md §2 B13-B14) —
  * fixed-size summaries whose merge
  * is commutative/associative, so they partial-aggregate map-side and cost
  * one tiny state per partition at any corpus size. First resident: a
  * count-min sketch ([[graft.functions.CountMinSketchAgg]], a custom
  * Catalyst `TypedImperativeAggregate`) — the streaming/distributed answer
  * to "frequency of key k" when the key space is too large to groupBy.
  */
object Sketches {

  /** B13: `q_events_cms` — build one count-min sketch over the event-type
    * stream in a single pass, then read each distinct type's point estimate
    * back out of the matrix next to its exact count. The estimate is
    * min over hash rows of the key's cell — always ≥ the true count, equal
    * when the key collides with nothing heavier. The sketch matrix is
    * 4×64 longs regardless of corpus size: at 100 TB the aggregate moves
    * 2 KiB per partition where an exact groupBy moves the key space. */
  def eventsCms(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Kernels.register(spark)
    val ev = Tables.events(spark, dir)
    val sketch = ev.agg(expr("graft_cms_sketch(event_type)").as("m"))
    ev.groupBy("event_type").agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(sketch))
      .withColumn("cms_est", expr(
        "array_min(transform(graft_cms_cells(event_type), c -> element_at(m, CAST(c + 1 AS INT))))"))
      .select("event_type", "n_events", "cms_est")
      .orderBy("event_type")
  }

  /** DuckDB twin — the sketch algebra in closed form: cell value = sum of
    * counts of the keys hashing there, estimate = min over rows. Exact
    * integer math, so it matches the aggregate bit-for-bit. */
  val eventsCmsSql: String = s"""
    WITH counts AS (
      SELECT event_type, count(*) AS n_events FROM events GROUP BY 1),
    hk AS (
      SELECT event_type, n_events,
        list_reduce(list_transform(range(1, length(event_type) + 1), i ->
          CAST(ascii(substr(event_type, CAST(i AS INT), 1)) AS BIGINT)),
          (acc, c) -> (acc * 31 + c) % 2147483647) AS h
      FROM counts),
    kc AS (
      SELECT event_type, n_events, d,
        (${graft.functions.Kernels.rowASql("d + 1")} * h
          + ${graft.functions.Kernels.rowBSql("d + 1")}) % 2147483647 % 64 AS g
      FROM hk, (SELECT unnest(range(0, 4)) AS d)),
    cells AS (
      SELECT d, g, CAST(SUM(n_events) AS BIGINT) AS c FROM kc GROUP BY 1, 2)
    SELECT kc.event_type, kc.n_events, min(cells.c) AS cms_est
    FROM kc JOIN cells ON kc.d = cells.d AND kc.g = cells.g
    GROUP BY 1, 2
    ORDER BY event_type"""

  /** B20: `q_events_hll` — approximate distinct users per event type via a
    * deterministic HyperLogLog ([[graft.functions.HllSketchAgg]], m = 64
    * max-merged registers) next to the exact COUNT(DISTINCT). The registers
    * are 64 longs per group at any corpus size, merge idempotently, and
    * partial-aggregate map-side — where the exact distinct shuffles every
    * (event_type, user_id) pair. The raw estimate α·m²/Σ2^(−reg) stays in
    * exact-double territory (powers of two, one division, no ln), so the
    * oracle reproduces it bit-for-bit in closed form. */
  def eventsHll(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Kernels.register(spark)
    val am2 = graft.functions.Kernels.HllAlphaM2
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"),
        expr("graft_hll_sketch(user_id)").as("regs"))
      .withColumn("hll_est", expr(
        s"CAST($am2 AS DOUBLE) / aggregate(regs, CAST(0 AS DOUBLE), (acc, r) -> acc + pow(CAST(2 AS DOUBLE), -r))"))
      .select("event_type", "n_exact", "hll_est")
      .orderBy("event_type")
  }

  val eventsHllSql: String = {
    import graft.functions.Kernels.{HllA, HllB, HllM, HllMaxRho, HllAlphaM2}
    s"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
        ($HllA * (user_id % 2147483647) + $HllB) % 2147483647 AS h
      FROM du),
    rr AS (
      SELECT event_type, h % $HllM AS reg,
        CASE WHEN h // $HllM = 0 THEN $HllMaxRho
             ELSE $HllMaxRho - length(bin(h // $HllM)) END AS rho
      FROM h),
    regs AS (SELECT event_type, reg, MAX(rho) AS r FROM rr GROUP BY 1, 2),
    full_regs AS (
      SELECT et.event_type, g.j, coalesce(regs.r, 0) AS r
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN (SELECT unnest(range(0, $HllM)) AS j) g
      LEFT JOIN regs ON regs.event_type = et.event_type AND regs.reg = g.j),
    est AS (
      SELECT event_type,
        CAST('$HllAlphaM2' AS DOUBLE) / list_reduce(
          list_prepend(CAST(0 AS DOUBLE),
            list_transform(list(r ORDER BY j), x -> pow(CAST(2 AS DOUBLE), -x))),
          (acc, b) -> acc + b) AS hll_est
      FROM full_regs GROUP BY event_type),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1)
    SELECT exact.event_type AS event_type, exact.n_exact, est.hll_est
    FROM exact JOIN est ON exact.event_type = est.event_type
    ORDER BY exact.event_type"""
  }

  /** B14: `q_events_paths` — each user's full event journey as an ordered
    * path string (funnel/path analysis input). One shuffle on user_id; the
    * per-user sort happens inside the aggregate on collected structs, and
    * event times are unique per user so the order — and the hash — is
    * deterministic. */
  def eventsPaths(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        concat_ws(">", expr(
          "transform(array_sort(collect_list(struct(ts_us, event_type))), x -> x.event_type)"))
          .as("path"))
      .orderBy("user_id")

  val eventsPathsSql: String = """
    SELECT user_id, count(*) AS n_events,
      string_agg(event_type, '>' ORDER BY epoch_us(ts), event_type) AS path
    FROM events GROUP BY user_id ORDER BY user_id"""

  /** B15/C19: `q_text_top_terms` — exact top-k vocabulary over the corpus.
    * Token explode partial-aggregates map-side; the global top-k is a
    * TakeOrderedAndProject (per-partition top-k, then a k-row merge on the
    * driver) — never a full sort of the vocabulary. Ties broken by token so
    * the cut is deterministic. */
  def topTerms(spark: SparkSession, dir: String, k: Int = TopTermsK): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Top-k cut for B15 — shared by operator and oracle. */
  val TopTermsK: Int = 100

  val topTermsSql: String = s"""
    SELECT token, count(*) AS n
    FROM (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents)
    WHERE length(token) > 0
    GROUP BY token ORDER BY n DESC, token LIMIT $TopTermsK"""
}
