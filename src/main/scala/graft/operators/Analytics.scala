package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact._
import graft.sources.Tables

/** Analytics query surface — the BigQuery-side capabilities of the
  * reference (star-schema reporting over cliente/producto/documento_venta/
  * detalle_documento, /root/reference/app/db/bigquery_client.py:100-137)
  * re-expressed as declarative Spark plans.
  *
  * Scale notes (100 TB):
  *  - dim⋈fact joins broadcast the dim side explicitly;
  *  - fact⋈fact joins shuffle once on the join key and aggregate partially
  *    before the exchange (all aggs are sum/count of longs);
  *  - every query filters/selects straight off the scan so pushdown and
  *    column pruning reach parquet.
  */
object Analytics {

  /** B1: pricing summary (TPC-H Q1 flavor). Narrow scan -> partial agg ->
    * single shuffle on (returnflag, linestatus): optimal at any scale. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"),
        cents(col("l_discount")).as("disc_pct"),
        cents(col("l_tax")).as("tax_pct"))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty_c")).as("sum_qty_c"),
        sum(col("price_c")).as("sum_price_c"),
        sum(discounted(col("price_c"), col("disc_pct"))).as("sum_disc_u"),
        sum(charged(col("price_c"), col("disc_pct"), col("tax_pct"))).as("sum_charge_u"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        centsToUnits(col("sum_qty_c")).as("sum_qty"),
        centsToUnits(col("sum_price_c")).as("sum_base_price"),
        (col("sum_disc_u").cast("double") / lit(10000.0)).as("sum_disc_price"),
        (col("sum_charge_u").cast("double") / lit(1000000.0)).as("sum_charge"),
        avgFromCents(col("sum_qty_c"), col("count_order")).as("avg_qty"),
        avgFromCents(col("sum_price_c"), col("count_order")).as("avg_price"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** B1 oracle — mirrors the integer-cents pipeline exactly. */
  val pricingSummarySql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(qty_c) AS DOUBLE) / 100.0 AS sum_qty,
      CAST(SUM(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
      CAST(SUM(price_c * (100 - disc_pct)) AS DOUBLE) / 10000.0 AS sum_disc_price,
      CAST(SUM(price_c * (100 - disc_pct) * (100 + tax_pct)) AS DOUBLE) / 1000000.0 AS sum_charge,
      CAST(SUM(qty_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_qty,
      CAST(SUM(price_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_price,
      COUNT(*) AS count_order
    FROM (
      SELECT l_returnflag, l_linestatus,
        CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
        CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
        CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
        CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_pct
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""
}
