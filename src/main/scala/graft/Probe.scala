package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: condensed physical-plan audit (joins, scans, pushdown,
  * exchanges) for the queries named in args, or a default set. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q5_nation_revenue", "q_incremental_sync", "q_validate_clients",
        "q3_top_unshipped", "q1_pricing_summary", "q_validate_products",
        "q_corpus_pipeline", "q_events_asof", "q_events_range_join",
        "q_events_cms", "q_text_top_terms",
        "q_funnel_conversion", "q_doc_chunk", "q_order_quantiles_hist",
        "q_corpus_decontaminate", "q_part_affinity", "q_events_anomaly",
        "q_modal_consistency", "q_abc_classification", "q_semantic_dedup",
        "q_events_dau_wau", "q_doc_novelty")
    for (q <- qs) {
      println(s"########## $q")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // keep it terse: join nodes, scans, filters pushed
      plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Scan") || l.contains("PushedFilters") ||
        l.contains("ReadSchema") || l.contains("Exchange") || l.contains("Reused") ||
        l.contains("HashAggregate") || l.contains("Generate") || l.contains("Window") ||
        l.contains("Sort") || l.contains("Project"))
        .foreach(println)
    }
    spark.stop()
  }
}
