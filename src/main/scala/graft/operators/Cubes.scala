package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact._
import graft.sources.Tables

/** Multi-dimensional analytics surface (SURVEY.md §2 B16-B19, B21) — the
  * OLAP shapes a BigQuery-backed reporting layer serves daily: rollup
  * subtotals, pivoted cross-tabs, windowed customer segmentation (RFM),
  * anti-join audits and exact group quantiles. The reference exposes its
  * loaded star schema to exactly this kind of reporting
  * (/root/reference/app/db/bigquery_client.py:100-137, the Sheets export in
  * app/db/sheets_sync.py); these queries re-express that surface Spark-first.
  *
  * Exactness (SURVEY.md §3): money in integer cents end-to-end, one final
  * division; quantile indices via integer ceil-division (never `ceil(q*n)`
  * on doubles — 0.9·n can land an ulp above an integer and shift the pick);
  * every window totally ordered with a key tie-break.
  */
object Cubes {

  /** B16: `q_sales_rollup` — revenue/order-count by (status, year) with
    * ROLLUP subtotals and grand total, the standard drill-down report. One
    * pass: Spark expands grouping sets in a single shuffle (each input row
    * feeds its group, its subtotal and the total via partial aggregation
    * — no per-level rescan). Subtotal keys surface as explicit grouping
    * flags + sentinel labels so the output is null-free and deterministic. */
  def salesRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("anio"),
        cents(col("o_totalprice")).as("total_c"))
      .rollup("status", "anio")
      .agg(grouping(col("status")).cast("int").as("g_status"),
        grouping(col("anio")).cast("int").as("g_anio"),
        count(lit(1)).as("n_orders"),
        sum("total_c").as("rev_c"))
      .select(coalesce(col("status"), lit("ALL")).as("status"),
        coalesce(col("anio"), lit(-1)).as("anio"),
        col("g_status"), col("g_anio"), col("n_orders"),
        centsToUnits(col("rev_c")).as("revenue"))
      .orderBy("g_status", "g_anio", "status", "anio")

  val salesRollupSql: String = """
    SELECT coalesce(status, 'ALL') AS status,
      coalesce(anio, -1) AS anio,
      CAST(GROUPING(status) AS INT) AS g_status,
      CAST(GROUPING(anio) AS INT) AS g_anio,
      COUNT(*) AS n_orders,
      CAST(SUM(total_c) AS DOUBLE) / 100.0 AS revenue
    FROM (
      SELECT o_orderstatus AS status,
        CAST(year(o_orderdate) AS INT) AS anio,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders)
    GROUP BY ROLLUP(status, anio)
    ORDER BY g_status, g_anio, status, anio"""

  /** The fixed pivot domain for B17 — `o_orderpriority` is a closed enum,
    * so the pivot is schema-stable (never `pivot(col)` without values, which
    * costs an extra distinct pass AND makes the schema data-dependent). */
  val Priorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** B17: `q_segment_pivot` — order counts per market segment pivoted by
    * priority, plus segment totals. ONE pass: the pivot aggregates count
    * AND cents-sum per cell in the same shuffle, and the segment totals are
    * row-wise sums over the closed (5-column) cell list — exact long adds
    * in a fixed column order, so no second scan/join for totals (measured 2
    * orders+customer scans in the joined-totals form this replaces). */
  def segmentPivot(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderpriority", "o_totalprice")
      .join(Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
    val slugs = Priorities.map(p => p -> ("n_" + p.split("-")(1)
      .toLowerCase.replace(" ", "_")))
    val pivoted = joined.groupBy("c_mktsegment")
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("c"))
    def nCol(p: String) = coalesce(col(s"`${p}_n`"), lit(0L))
    def cCol(p: String) = coalesce(col(s"`${p}_c`"), lit(0L))
    val withSlugs = slugs.foldLeft(pivoted) { case (df, (p, s)) =>
      df.withColumn(s, nCol(p))
    }
    withSlugs
      .withColumn("n_total", Priorities.map(nCol).reduce(_ + _))
      .withColumn("revenue", centsToUnits(Priorities.map(cCol).reduce(_ + _)))
      .select((Seq(col("c_mktsegment")) ++ slugs.map(s => col(s._2)) ++
        Seq(col("n_total"), col("revenue"))): _*)
      .orderBy("c_mktsegment")
  }

  val segmentPivotSql: String = """
    SELECT c_mktsegment,
      CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
      CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_not_specified,
      CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      COUNT(*) AS n_total,
      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** Analysis date for B18's recency — the day after the data's horizon,
    * a pinned report parameter (recomputing max(o_orderdate) per run would
    * make the report non-reproducible between runs over a growing table). */
  val RfmAsOf: String = "2001-08-02"

  /** B18: `q_customer_rfm` — recency/frequency/monetary quartiles WITHIN
    * each market segment (ntile(4) windows partitioned by segment, totally
    * ordered with a custkey tie-break so bucket edges are deterministic).
    *
    * Scale note: a segment is an unbounded window partition — fine while
    * segments are few and sortable (Spark range-sorts within partitions);
    * at a true 100 TB the quartile assignment swaps to comparing against
    * three exact boundary values per segment (see [[orderQuantiles]] for
    * the boundary machinery) so no single window ever sees a whole segment. */
  def customerRfm(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        col("o_orderdate"), cents(col("o_totalprice")).as("total_c"))
      .groupBy("o_custkey")
      .agg(datediff(lit(RfmAsOf).cast("date"),
          max(col("o_orderdate")).cast("date")).cast("int").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum("total_c").as("monetary_c"))
    val seg = perCust.join(
      Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
      col("o_custkey") === col("c_custkey"))
    def w(order: Seq[org.apache.spark.sql.Column]) =
      Window.partitionBy("c_mktsegment").orderBy(order: _*)
    seg
      .withColumn("r_q", ntile(4).over(
        w(Seq(col("recency_days").asc, col("c_custkey").asc))).cast("int"))
      .withColumn("f_q", ntile(4).over(
        w(Seq(col("frequency").desc, col("c_custkey").asc))).cast("int"))
      .withColumn("m_q", ntile(4).over(
        w(Seq(col("monetary_c").desc, col("c_custkey").asc))).cast("int"))
      .select(col("c_custkey"), col("c_mktsegment"),
        col("recency_days"), col("frequency"),
        centsToUnits(col("monetary_c")).as("monetary"),
        col("r_q"), col("f_q"), col("m_q"),
        concat(col("r_q"), col("f_q"), col("m_q")).as("rfm"))
      .orderBy("c_custkey")
  }

  val customerRfmSql: String = s"""
    WITH per_cust AS (
      SELECT o_custkey,
        CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
          DATE '$RfmAsOf') AS INT) AS recency_days,
        COUNT(*) AS frequency,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_c
      FROM orders GROUP BY o_custkey),
    seg AS (
      SELECT p.*, c.c_custkey, c.c_mktsegment
      FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey),
    q AS (
      SELECT c_custkey, c_mktsegment, recency_days, frequency, monetary_c,
        CAST(ntile(4) OVER (PARTITION BY c_mktsegment
          ORDER BY recency_days ASC, c_custkey ASC) AS INT) AS r_q,
        CAST(ntile(4) OVER (PARTITION BY c_mktsegment
          ORDER BY frequency DESC, c_custkey ASC) AS INT) AS f_q,
        CAST(ntile(4) OVER (PARTITION BY c_mktsegment
          ORDER BY monetary_c DESC, c_custkey ASC) AS INT) AS m_q
      FROM seg)
    SELECT c_custkey, c_mktsegment, recency_days, frequency,
      CAST(monetary_c AS DOUBLE) / 100.0 AS monetary,
      r_q, f_q, m_q,
      CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR) AS rfm
    FROM q ORDER BY c_custkey"""

  /** B43 history split — orders before this date are the "from" half,
    * at/after it the "to" half (the corpus spans 1995-01..2001-08, so the
    * halves carry comparable order mass). */
  val MigrationSplitDate: String = "1998-01-01"

  /** B43 spend-tier floors in integer cents (low < mid floor ≤ mid < high
    * floor ≤ high; zero orders in a half → 'none'). Fixed absolute
    * thresholds, deliberately NOT ntile quartiles: a rank-based tier needs
    * a global sort per half and — worse for the REPORT's meaning — moves
    * the goalposts between the two halves, so a customer could "migrate"
    * while spending identically. Around the sf0.01 half-spend median
    * (~1.1·10⁸ c) so all tiers are populated at test scale. */
  val TierMidFloorC: Long = 100000000L
  val TierHighFloorC: Long = 160000000L

  /** B43: `q_segment_migration` — the customer LIFECYCLE-MIGRATION matrix:
    * every customer's order history is split at [[MigrationSplitDate]],
    * each half classified into a fixed spend tier (none/low/mid/high via
    * [[TierMidFloorC]]/[[TierHighFloorC]]), and the report counts
    * customers per (tier_from, tier_to) cell with both halves' revenue —
    * the B31-Markov idea applied to revenue segments: the off-diagonal
    * mass IS churn risk ('high'→'none') and growth ('none'→anything), the
    * read a retention budget is allocated against.
    *
    * Plan: one narrow orders scan partial-aggregates both halves' sums
    * and counts in the SAME o_custkey shuffle (conditional sums, not two
    * passes), the customer base joins custkey-keyed — Catalyst broadcasts
    * the halves aggregate while its stats fit (the test-scale plan) and
    * falls back to sort-merge at fact scale, where the aggregate is
    * O(customers); never-buyers surface via the left join → 'none' — and
    * the matrix agg collapses onto a ≤ 16-cell grid map-side.
    * Exactness: integer cents end-to-end, tier boundaries compare exact
    * longs, one final division per revenue column. */
  def segmentMigration(spark: SparkSession, dir: String): DataFrame = {
    val split = lit(MigrationSplitDate).cast("timestamp")
    val halves = Tables.orders(spark, dir)
      .select(col("o_custkey"), (col("o_orderdate") < split).as("h1"),
        cents(col("o_totalprice")).as("c"))
      .groupBy("o_custkey").agg(
        sum(when(col("h1"), col("c")).otherwise(0L)).as("s1"),
        sum(when(!col("h1"), col("c")).otherwise(0L)).as("s2"),
        sum(when(col("h1"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("h1"), 1L).otherwise(0L)).as("n2"))
    def tier(s: Column, n: Column): Column =
      when(n === 0L, "none")
        .when(s < TierMidFloorC, "low")
        .when(s < TierHighFloorC, "mid")
        .otherwise("high")
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(halves, col("c_custkey") === col("o_custkey"), "left")
      .select(
        tier(coalesce(col("s1"), lit(0L)), coalesce(col("n1"), lit(0L)))
          .as("tier_from"),
        tier(coalesce(col("s2"), lit(0L)), coalesce(col("n2"), lit(0L)))
          .as("tier_to"),
        coalesce(col("s1"), lit(0L)).as("s1"),
        coalesce(col("s2"), lit(0L)).as("s2"))
      .groupBy("tier_from", "tier_to")
      .agg(count(lit(1)).as("n_customers"),
        centsToUnits(sum("s1")).as("spend_h1"),
        centsToUnits(sum("s2")).as("spend_h2"))
      .orderBy("tier_from", "tier_to")
  }

  val segmentMigrationSql: String = s"""
    WITH h AS (
      SELECT o_custkey,
        CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '$MigrationSplitDate'
          THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '$MigrationSplitDate'
          THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS s2,
        CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '$MigrationSplitDate'
          THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '$MigrationSplitDate'
          THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM orders GROUP BY 1),
    b AS (
      SELECT c.c_custkey, coalesce(h.s1, 0) AS s1, coalesce(h.s2, 0) AS s2,
        coalesce(h.n1, 0) AS n1, coalesce(h.n2, 0) AS n2
      FROM customer c LEFT JOIN h ON h.o_custkey = c.c_custkey),
    t AS (
      SELECT
        CASE WHEN n1 = 0 THEN 'none'
             WHEN s1 < $TierMidFloorC THEN 'low'
             WHEN s1 < $TierHighFloorC THEN 'mid' ELSE 'high' END AS tier_from,
        CASE WHEN n2 = 0 THEN 'none'
             WHEN s2 < $TierMidFloorC THEN 'low'
             WHEN s2 < $TierHighFloorC THEN 'mid' ELSE 'high' END AS tier_to,
        s1, s2
      FROM b)
    SELECT tier_from, tier_to, count(*) AS n_customers,
      CAST(SUM(s1) AS DOUBLE) / 100.0 AS spend_h1,
      CAST(SUM(s2) AS DOUBLE) / 100.0 AS spend_h2
    FROM t GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Inactivity horizon for B19 — customers with no order at/after this
    * date count as churned. */
  val InactiveSince: String = "2001-01-01"

  /** B19: `q_customers_no_orders` — customers with no order since
    * [[InactiveSince]], by segment: the churn-audit anti-join (the converse
    * of the reference's MERGE guarantee that every document references a
    * loaded client). `left_anti` keys on custkey — no row ever crosses as
    * data — and the date predicate pushes into the orders scan, so the
    * anti side is only the recent slice, not order history. */
  def customersNoOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("bal_c"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit(InactiveSince).cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum("bal_c").as("bal_sum_c"),
        min("c_custkey").as("first_custkey"),
        max("c_custkey").as("last_custkey"))
      .select(col("c_mktsegment"), col("n_customers"),
        centsToUnits(col("bal_sum_c")).as("acctbal_sum"),
        col("first_custkey"), col("last_custkey"))
      .orderBy("c_mktsegment")

  val customersNoOrdersSql: String = s"""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
      CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS acctbal_sum,
      MIN(c_custkey) AS first_custkey,
      MAX(c_custkey) AS last_custkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '$InactiveSince 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** B21: `q_order_quantiles` — exact p50/p90/p99 of order value per
    * segment. The pick index is `ceil(q·n)` computed in INTEGER arithmetic
    * ((num·n + den − 1) div den) — the double form can land an ulp above an
    * integer and shift the pick — and the pick itself is a conditional min
    * over a totally-ordered row_number, so both engines select the same
    * physical row. Exact selection needs the per-segment sort; at 100 TB
    * the same report would pre-aggregate to a (segment, cents) value
    * histogram first — cardinality-bounded — and cumulative-sum that. */
  def orderQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("total_c").asc, col("o_orderkey").asc)
    def pick(num: Int, den: Int) =
      min(when(col("rn") === expr(s"($num * n + $den - 1) DIV $den"),
        col("total_c")))
    seg.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("c_mktsegment")))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        centsToUnits(pick(1, 2)).as("p50"),
        centsToUnits(pick(9, 10)).as("p90"),
        centsToUnits(pick(99, 100)).as("p99"))
      .orderBy("c_mktsegment")
  }

  val orderQuantilesSql: String = """
    WITH seg AS (
      SELECT c_mktsegment, o_orderkey,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders JOIN customer ON o_custkey = c_custkey),
    ranked AS (
      SELECT c_mktsegment, total_c,
        CAST(row_number() OVER (PARTITION BY c_mktsegment
          ORDER BY total_c ASC, o_orderkey ASC) AS BIGINT) AS rn,
        COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM seg)
    SELECT c_mktsegment, COUNT(*) AS n_orders,
      CAST(MIN(CASE WHEN rn = (1 * n + 1) // 2 THEN total_c END) AS DOUBLE) / 100.0 AS p50,
      CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN total_c END) AS DOUBLE) / 100.0 AS p90,
      CAST(MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN total_c END) AS DOUBLE) / 100.0 AS p99
    FROM ranked
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** B24: `q_order_quantiles_hist` — the SHIPPED 100 TB path for B21, not a
    * doc note: pre-aggregate to a (segment, cents-value) histogram (bounded
    * by the distinct money values, not row count), cumulative-sum it within
    * each segment, and pick each quantile as the minimum value whose
    * cumulative count reaches the integer ceil-division index. The k-th
    * smallest row value IS the least histogram value with cum ≥ k, so this
    * agrees with B21's row-pick bit-for-bit (spec-pinned) — while the only
    * per-segment window runs over the histogram, never the raw rows: at
    * 100 TB the sort input shrinks from billions of orders to at most the
    * distinct price points. Same integer-exact index math as B21. */
  def orderQuantilesHist(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(spark, dir)
      .select(col("o_custkey"), cents(col("o_totalprice")).as("total_c"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
    val hist = seg.groupBy("c_mktsegment", "total_c")
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("c_mktsegment").orderBy("total_c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(num: Int, den: Int) =
      min(when(col("cum") >= expr(s"($num * n + $den - 1) DIV $den"),
        col("total_c")))
    hist.withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(Window.partitionBy("c_mktsegment")))
      .groupBy("c_mktsegment")
      .agg(sum("cnt").as("n_orders"),
        centsToUnits(pick(1, 2)).as("p50"),
        centsToUnits(pick(9, 10)).as("p90"),
        centsToUnits(pick(99, 100)).as("p99"))
      .orderBy("c_mktsegment")
  }

  val orderQuantilesHistSql: String = """
    WITH seg AS (
      SELECT c_mktsegment,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders JOIN customer ON o_custkey = c_custkey),
    hist AS (
      SELECT c_mktsegment, total_c, COUNT(*) AS cnt
      FROM seg GROUP BY 1, 2),
    c AS (
      SELECT c_mktsegment, total_c, cnt,
        CAST(SUM(cnt) OVER (PARTITION BY c_mktsegment ORDER BY total_c
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        CAST(SUM(cnt) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
      FROM hist)
    SELECT c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS n_orders,
      CAST(MIN(CASE WHEN cum >= (1 * n + 1) // 2 THEN total_c END) AS DOUBLE) / 100.0 AS p50,
      CAST(MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN total_c END) AS DOUBLE) / 100.0 AS p90,
      CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN total_c END) AS DOUBLE) / 100.0 AS p99
    FROM c
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** B32: `q_abc_classification` — Pareto / ABC inventory classification of
    * the part catalog by discounted revenue: class A = items inside the
    * first 80% of cumulative revenue, B = 80-95%, C = the tail — the
    * stock-policy report every retail ETL (the reference loads a product
    * catalog, /root/reference/app/services/etl_service.py:59-107) feeds
    * purchasing with.
    *
    * Exactness: revenue in integer hundredth-of-cent units (cents ×
    * (100−disc)); the class boundaries compare `cum·100 ≤ 80·total` /
    * `cum·100 ≤ 95·total` in integer arithmetic — never a double share —
    * so the A/B/C cut is bit-deterministic. The reported `cum_share` is one
    * final double division. The cumulative window is totally ordered
    * (revenue DESC, partkey ASC).
    *
    * Scale: the fact scan partial-aggregates to one row PER PART before any
    * window, so the cumulative sort runs over the catalog (bounded,
    * ~10⁵-10⁷ rows — Spark range-partitions the sort), never the lineitem
    * table; the part join attaches brand to catalog-sized rows and AQE
    * picks its strategy. Long-overflow headroom: 100·total fits a signed
    * long up to $9.2e14 of discounted revenue. */
  def abcClassification(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        discounted(cents(col("l_extendedprice")), cents(col("l_discount")))
          .as("rev_u"))
      .groupBy("l_partkey")
      .agg(sum("rev_u").as("rev_u"), count(lit(1)).as("n_lines"))
    val wCum = Window.orderBy(col("rev_u").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perPart
      .withColumn("cum_u", sum("rev_u").over(wCum))
      .withColumn("total_u", sum("rev_u").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("n_lines"),
        (col("rev_u").cast("double") / lit(10000.0)).as("revenue"),
        (col("cum_u").cast("double") / col("total_u").cast("double"))
          .as("cum_share"),
        when(col("cum_u") * 100 <= col("total_u") * 80, "A")
          .when(col("cum_u") * 100 <= col("total_u") * 95, "B")
          .otherwise("C").as("clase"))
      .orderBy(col("revenue").desc, col("p_partkey"))
  }

  val abcClassificationSql: String = """
    WITH per_part AS (
      SELECT l_partkey,
        SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
            (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_u,
        COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_partkey),
    cum AS (
      SELECT l_partkey, rev_u, n_lines,
        CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, l_partkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_u,
        CAST(SUM(rev_u) OVER () AS BIGINT) AS total_u
      FROM per_part)
    SELECT p_partkey, p_brand, n_lines,
      CAST(rev_u AS DOUBLE) / 10000.0 AS revenue,
      CAST(cum_u AS DOUBLE) / CAST(total_u AS DOUBLE) AS cum_share,
      CASE WHEN cum_u * 100 <= total_u * 80 THEN 'A'
           WHEN cum_u * 100 <= total_u * 95 THEN 'B'
           ELSE 'C' END AS clase
    FROM cum JOIN part ON l_partkey = p_partkey
    ORDER BY revenue DESC, p_partkey"""

  /** Interval histogram cap for B33 — gaps of [[IntervalCapWeeks]] weeks or
    * more collapse into one open-ended bucket so the report is
    * schema-stable. */
  val IntervalCapWeeks: Int = 12

  /** B33: `q_order_intervals` — inter-purchase time distribution: the gap in
    * days between each customer's consecutive orders, bucketed by week and
    * rolled up per market segment (the repurchase-cadence report behind
    * replenishment marketing). Same-day repeat orders land in bucket 0.
    *
    * Exactness: gaps are exact integer day differences off a lag window
    * totally ordered by (orderdate, orderkey); the per-bucket mean is one
    * final division of integer sums.
    *
    * Scale: ONE custkey-keyed exchange for the lag window (a customer's
    * order history is human-bounded), then a partial-aggregated shuffle onto
    * the tiny (segment × ≤13 buckets) grid. The customer join attaches the
    * segment BEFORE the roll-up so the wide fact rows never shuffle twice. */
  def orderIntervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val gaps = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .withColumn("prev_date", lag("o_orderdate", 1).over(w))
      .filter(col("prev_date").isNotNull)
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date"))
          .cast("long").as("gap_days"))
    gaps
      .join(Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        least(expr("gap_days DIV 7"), lit(IntervalCapWeeks.toLong))
          .cast("long").as("week_bucket"), col("gap_days"))
      .groupBy("c_mktsegment", "week_bucket")
      .agg(count(lit(1)).as("n_gaps"), sum("gap_days").as("sum_days"))
      .select(col("c_mktsegment"), col("week_bucket"), col("n_gaps"),
        (col("sum_days").cast("double") / col("n_gaps").cast("double"))
          .as("avg_gap_days"))
      .orderBy("c_mktsegment", "week_bucket")
  }

  val orderIntervalsSql: String = s"""
    WITH gaps AS (
      SELECT o_custkey,
        CAST(date_diff('day',
          CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
          CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
      FROM orders),
    g AS (SELECT * FROM gaps WHERE gap_days IS NOT NULL)
    SELECT c_mktsegment,
      CAST(least(gap_days // 7, $IntervalCapWeeks) AS BIGINT) AS week_bucket,
      COUNT(*) AS n_gaps,
      CAST(SUM(gap_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_gap_days
    FROM g JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2"""
}
