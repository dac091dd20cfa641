package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Empty-corpus robustness: at 100 TB every operator eventually meets an
  * empty slice (a fresh source, a filtered-out partition, a day with no
  * crawl). Each corpus operator must return an EMPTY result — never throw,
  * never NPE on a null aggregate, never hang a convergence loop (the C18
  * labelSum guard exists exactly for this). Oracle parity on emptiness is
  * trivially true, so this is spec-only coverage. */
class EdgeSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = tmpDir("graft_empty")
    val docs = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val embs = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], docs)
      .write.parquet(s"$dir/documents.parquet")
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], embs)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("corpus operators return empty on an empty corpus, never throw") {
    val corpusQueries = Seq(
      "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_simhash_band",
      "q_dedup_components", "q_dedup_canonical", "q_dedup_incremental",
      "q_dedup_prefix", "q_text_tokencount", "q_text_quality",
      "q_tokenizer_fertility", "q_mix_epochs", "q_corpus_pack",
      "q_corpus_pack_hier", "q_corpus_sample_stratified", "q_doc_novelty",
      "q_embed_kmeans", "q_embed_pq", "q_embed_quantize")
    for (q <- corpusQueries) {
      val n = SparkEntry.queries(q)(spark, emptyDir).count()
      assert(n == 0, s"$q returned $n rows on an empty corpus")
    }
    spark.catalog.clearCache(): Unit
  }
}
