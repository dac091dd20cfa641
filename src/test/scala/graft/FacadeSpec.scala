package graft

/** The consumer facade (Facade.scala) must stay a PURE delegation layer:
  * identical schemas and rows as the registered gate queries, with the
  * full registry reachable through run()/names. Logic drifting into the
  * facade would fork the semantics away from the oracle-checked
  * surface — these pins make that impossible to miss. */
class FacadeSpec extends SparkSpec {

  test("facade delegates are the registered gate queries, bit for bit") {
    val pairs: Seq[(org.apache.spark.sql.DataFrame, String)] = Seq(
      Corpus.curate(spark, sf) -> "q_corpus_pipeline",
      Corpus.exactDuplicates(spark, sf) -> "q_dedup_exact",
      Corpus.split(spark, sf) -> "q_corpus_split",
      Corpus.annSearch(spark, sf) -> "q_ann_ivf",
      Reports.pricingSummary(spark, sf) -> "q1_pricing_summary",
      Reports.customerOrderDistribution(spark, sf) ->
        "q_customer_order_distribution",
      Reports.topSupplierRevenue(spark, sf) -> "q_top_supplier_revenue")
    pairs.foreach { case (df, name) =>
      val reg = SparkEntry.queries(name)(spark, sf)
      assert(df.schema == reg.schema, s"$name: facade schema diverged")
      assert(df.collect().toSeq == reg.collect().toSeq,
        s"$name: facade rows diverged")
      spark.catalog.clearCache()
    }
  }

  test("run()/names reach the full registered surface") {
    assert(Corpus.names == SparkEntry.queries.keys.toSeq.sorted)
    assert(Corpus.names.size == SparkEntry.oracleSql.size,
      "facade surface out of step with the oracle registry")
    assert(Corpus.run("q_customers_no_orders")(spark, sf).count() > 0)
    assert(Reports.run("q_sales_by_month")(spark, sf).count() > 0)
    spark.catalog.clearCache(): Unit
  }
}
