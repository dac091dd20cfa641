package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => Analytics.pricingSummary(s, d)),
    "q_validate_clients" -> ((s, d) => Etl.validateClients(s, d)),
    "q_validate_products" -> ((s, d) => Etl.validateProducts(s, d)),
    "q_validate_documents" -> ((s, d) => Etl.validateDocuments(s, d)),
    "q_validate_details" -> ((s, d) => Etl.validateDetails(s, d)),
    "q_merge_upsert" -> ((s, d) => Etl.mergeUpsert(s, d)),
    "q_incremental_sync" -> ((s, d) => Etl.incrementalSync(s, d)),
    "q_first_variant_dedup" -> ((s, d) => Etl.firstPerKey(s, d)),
    "q_clean_reload_counts" -> ((s, d) => Etl.reloadAudit(s, d))
  )

  /** DuckDB-equivalent SQL per query (same column names, same exactness). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Analytics.pricingSummarySql,
    "q_validate_clients" -> Etl.validateClientsSql,
    "q_validate_products" -> Etl.validateProductsSql,
    "q_validate_documents" -> Etl.validateDocumentsSql,
    "q_validate_details" -> Etl.validateDetailsSql,
    "q_merge_upsert" -> Etl.mergeUpsertSql,
    "q_incremental_sync" -> Etl.incrementalSyncSql,
    "q_first_variant_dedup" -> Etl.firstPerKeySql,
    "q_clean_reload_counts" -> Etl.reloadAuditSql
  )
}
