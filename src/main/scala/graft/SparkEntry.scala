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
    "q_incremental_sync_events" -> ((s, d) => Etl.syncEvents(s, d)),
    "q_first_variant_dedup" -> ((s, d) => Etl.firstPerKey(s, d)),
    "q_clean_reload_counts" -> ((s, d) => Etl.reloadAudit(s, d)),
    "q3_top_unshipped" -> ((s, d) => Analytics.topUnshipped(s, d)),
    "q5_nation_revenue" -> ((s, d) => Analytics.nationRevenue(s, d)),
    "q_sales_by_month" -> ((s, d) => Analytics.salesByMonth(s, d)),
    "q_top_products" -> ((s, d) => Analytics.topProducts(s, d)),
    "q_customer_stats" -> ((s, d) => Analytics.customerStats(s, d)),
    "q_margin_analysis" -> ((s, d) => Analytics.marginAnalysis(s, d)),
    "q_events_window_agg" -> ((s, d) => Analytics.eventsWindowAgg(s, d)),
    "q_events_sessionize" -> ((s, d) => Analytics.sessionize(s, d)),
    "q_events_json" -> ((s, d) => Analytics.eventsJson(s, d)),
    "q_events_asof" -> ((s, d) => AsOf.eventsAsof(s, d)),
    "q_events_range_join" -> ((s, d) => RangeJoin.eventsWindowPairs(s, d)),
    "q_events_cms" -> ((s, d) => Sketches.eventsCms(s, d)),
    "q_events_paths" -> ((s, d) => Sketches.eventsPaths(s, d)),
    "q_text_top_terms" -> ((s, d) => Sketches.topTerms(s, d)),
    "q_text_tokencount" -> ((s, d) => TextOps.tokenCount(s, d)),
    "q_text_quality" -> ((s, d) => TextOps.qualityScore(s, d)),
    "q_text_langid" -> ((s, d) => TextOps.langId(s, d)),
    "q_text_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    "q_text_pii_scrub" -> ((s, d) => TextOps.piiScrub(s, d)),
    "q_corpus_pipeline" -> ((s, d) => Pipeline.corpusPipeline(s, d)),
    "q_corpus_split" -> ((s, d) => Pipeline.corpusSplit(s, d)),
    "q_dedup_exact" -> ((s, d) => DedupOps.dedupExact(s, d)),
    "q_dedup_minhash_lsh" -> ((s, d) => DedupOps.dedupMinhashLsh(s, d)),
    "q_dedup_simhash" -> ((s, d) => DedupOps.dedupSimhash(s, d)),
    "q_dedup_simhash_band" -> ((s, d) => DedupOps.dedupSimhashBand(s, d)),
    "q_dedup_components" -> ((s, d) => DedupOps.dedupComponents(s, d)),
    "q_dedup_ngram_jaccard" -> ((s, d) => DedupOps.dedupNgramJaccard(s, d)),
    "q_neardup_embedding" -> ((s, d) => EmbeddingOps.neardupEmbedding(s, d)),
    "q_neardup_embedding_lsh" -> ((s, d) => EmbeddingOps.neardupEmbeddingLsh(s, d)),
    "q_ann_bruteforce" -> ((s, d) => EmbeddingOps.annBruteforce(s, d)),
    "q_ann_lsh" -> ((s, d) => EmbeddingOps.annLsh(s, d)),
    "q_ann_ivf" -> ((s, d) => EmbeddingOps.annIvf(s, d)),
    "q_multimodal_meta" -> ((s, d) => EmbeddingOps.multimodalMeta(s, d))
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
    "q_incremental_sync_events" -> Etl.syncEventsSql,
    "q_first_variant_dedup" -> Etl.firstPerKeySql,
    "q_clean_reload_counts" -> Etl.reloadAuditSql,
    "q3_top_unshipped" -> Analytics.topUnshippedSql,
    "q5_nation_revenue" -> Analytics.nationRevenueSql,
    "q_sales_by_month" -> Analytics.salesByMonthSql,
    "q_top_products" -> Analytics.topProductsSql,
    "q_customer_stats" -> Analytics.customerStatsSql,
    "q_margin_analysis" -> Analytics.marginAnalysisSql,
    "q_events_window_agg" -> Analytics.eventsWindowAggSql,
    "q_events_sessionize" -> Analytics.sessionizeSql,
    "q_events_json" -> Analytics.eventsJsonSql,
    "q_events_asof" -> AsOf.eventsAsofSql,
    "q_events_range_join" -> RangeJoin.eventsWindowPairsSql,
    "q_events_cms" -> Sketches.eventsCmsSql,
    "q_events_paths" -> Sketches.eventsPathsSql,
    "q_text_top_terms" -> Sketches.topTermsSql,
    "q_text_tokencount" -> TextOps.tokenCountSql,
    "q_text_quality" -> TextOps.qualityScoreSql,
    "q_text_langid" -> TextOps.langIdSql,
    "q_text_fingerprint" -> TextOps.fingerprintSql,
    "q_text_pii_scrub" -> TextOps.piiScrubSql,
    "q_corpus_pipeline" -> Pipeline.corpusPipelineSql,
    "q_corpus_split" -> Pipeline.corpusSplitSql,
    "q_dedup_exact" -> DedupOps.dedupExactSql,
    "q_dedup_minhash_lsh" -> DedupOps.dedupMinhashLshSql,
    "q_dedup_simhash" -> DedupOps.dedupSimhashSql,
    "q_dedup_simhash_band" -> DedupOps.dedupSimhashBandSql,
    "q_dedup_components" -> DedupOps.dedupComponentsSql,
    "q_dedup_ngram_jaccard" -> DedupOps.dedupNgramJaccardSql,
    "q_neardup_embedding" -> EmbeddingOps.neardupEmbeddingSql,
    "q_neardup_embedding_lsh" -> EmbeddingOps.neardupEmbeddingLshSql,
    "q_ann_bruteforce" -> EmbeddingOps.annBruteforceSql,
    "q_ann_lsh" -> EmbeddingOps.annLshSql,
    "q_ann_ivf" -> EmbeddingOps.annIvfSql,
    "q_multimodal_meta" -> EmbeddingOps.multimodalMetaSql
  )
}
