package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
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

  test("events loader normalizes both ts encodings to identical nanos") {
    // the driver has shipped events.ts as TIMESTAMP(NANOS)-read-as-long
    // AND as µs TIMESTAMP_NTZ; Tables.events dispatches on the file
    // schema — write the SAME instants under both encodings and pin that
    // the loader yields bit-identical nanos rows for each
    val sp = spark
    import sp.implicits._
    val dirNtz = tmpDir("ev_ntz"); val dirLong = tmpDir("ev_long")
    val micros = Seq(
      (1L, 1705276800000000L, 10L, "click", 1.5, "{}"),
      (2L, 1705276800999999L, 11L, "view", 2.0, "{}"),
      (3L, 1704067199000001L, 10L, "error", 0.0, "{}"))
    micros.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dirNtz/events.parquet")
    micros.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dirLong/events.parquet")
    val fromNtz = graft.sources.Tables.events(sp, dirNtz)
    val fromLong = graft.sources.Tables.events(sp, dirLong)
    assert(fromNtz.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(fromNtz.except(fromLong).count() == 0)
    assert(fromLong.except(fromNtz).count() == 0)
    // the pushdown-safe bounded read agrees across encodings too,
    // including a bound with sub-second nanos resolution on the µs grain
    val bound = 1705276800000000L * 1000L
    val sNtz = graft.sources.Tables.eventsSince(sp, dirNtz, bound)
    val sLong = graft.sources.Tables.eventsSince(sp, dirLong, bound)
    assert(sNtz.select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    assert(sNtz.except(sLong).count() == 0)
    assert(sLong.except(sNtz).count() == 0)
  }

  test("corpus operators return empty on an empty corpus, never throw") {
    val corpusQueries = Seq(
      "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_simhash_band",
      "q_dedup_components", "q_dedup_canonical", "q_dedup_incremental",
      "q_dedup_prefix", "q_text_tokencount", "q_text_quality",
      "q_tokenizer_fertility", "q_mix_epochs", "q_corpus_pack",
      "q_corpus_pack_hier", "q_corpus_sample_stratified", "q_doc_novelty",
      "q_embed_kmeans", "q_embed_pq", "q_embed_quantize",
      "q_cluster_profile", "q_novelty_curve", "q_quality_classifier",
      "q_substr_dup_spans", "q_feed_novelty", "q_frame_dedup",
      "q_semantic_drift", "q_ann_serve",
      "q_snapshot_diff", "q_bloom_decontaminate", "q_retrieval_maxsim",
      "q_token_budget_fill", "q_contamination_spans",
      "q_dedup_pair_precision", "q_classifier_calibration",
      // round-8 final additions: the span-mask chain, lang mix, the PQ
      // distortion rollup and the recall probe (no pairs → no rows; the
      // fixed 3-threshold grid only spans scored pairs)
      "q_span_mask_plan", "q_mask_coalesce", "q_mask_datasheet",
      "q_doc_lang_mix", "q_embed_pq_distortion", "q_dedup_lsh_recall")
    for (q <- corpusQueries) {
      val n = SparkEntry.queries(q)(spark, emptyDir).count()
      assert(n == 0, s"$q returned $n rows on an empty corpus")
    }
    // the fixed-shape reports keep their row grid on an empty corpus —
    // zero/NULL cells, never a throw (ANSI divisions included)
    assert(SparkEntry.queries("q_dedup_agreement")(spark, emptyDir)
      .count() == 3)
    assert(SparkEntry.queries("q_dedup_agreement_samesource")(spark, emptyDir)
      .count() == 3)
    assert(SparkEntry.queries("q_dedup_banding_sweep")(spark, emptyDir)
      .count() == 4)
    // C112 keeps its 3-pair grid (n_probes = 0, NULL means, never a throw)
    assert(SparkEntry.queries("q_ann_overlap")(spark, emptyDir)
      .count() == 3)
    assert(SparkEntry.queries("q_span_savings")(spark, emptyDir)
      .count() == 1)
    // the covariance grid keeps its 2080-cell shape (zeros, n_vecs = 0)
    assert(SparkEntry.queries("q_embed_covariance")(spark, emptyDir)
      .count() == 64 * 65 / 2)
    spark.catalog.clearCache(): Unit
  }

  test("quantile sketch edges: empty, single, identical, huge, mixed") {
    val sp = spark
    import sp.implicits._
    def eventsDir(values: Seq[Double]): String = {
      val dir = tmpDir("qs_edge")
      values.zipWithIndex.map { case (v, i) =>
        (i.toLong, 1700000000000000000L + i * 1000000000L, i.toLong % 7,
          "click", v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      dir
    }
    // empty stream: every quantile query returns zero rows, never throws
    val empty = eventsDir(Seq.empty)
    for (q <- Seq("q_value_quantile_sketch", "q_qsketch_s_sweep",
        "q_value_quantiles_by_type", "q_value_quantile_drift")) {
      assert(SparkEntry.queries(q)(sp, empty).count() == 0,
        s"$q must be empty on an empty stream")
      sp.catalog.clearCache()
    }
    // single value: every grid quantile returns ITS bucket — rank bracket
    // (0, 1], value bracket containing the one observation
    val single = eventsDir(Seq(123.45))
    val cents = 12345L
    for (r <- operators.Sketches.valueQuantileSketch(sp, single).collect()) {
      assert(r.getAs[Long]("n") == 1 && r.getAs[Long]("r") == 1)
      assert(r.getAs[Long]("n_below") == 0 && r.getAs[Long]("n_thru") == 1)
      assert(r.getAs[Long]("est_lo") <= cents &&
        cents < r.getAs[Long]("est_hi"), r.toString)
    }
    sp.catalog.clearCache()
    // 1000 identical values: one occupied bucket, every quantile lands in
    // it with the full mass
    val same = eventsDir(Seq.fill(1000)(42.0))
    for (r <- operators.Sketches.valueQuantileSketch(sp, same).collect()) {
      assert(r.getAs[Long]("n_below") == 0 &&
        r.getAs[Long]("n_thru") == 1000)
      assert(r.getAs[Long]("est_lo") <= 4200L &&
        4200L < r.getAs[Long]("est_hi"))
    }
    sp.catalog.clearCache()
    // huge + tiny mixed (centuries of octaves apart): the rank guarantee
    // and the 2^-s relative bracket hold across the whole range — the
    // unbounded-domain case the B24 cents histogram cannot serve
    val mixed = eventsDir(
      Seq.fill(50)(0.01) ++ Seq.fill(30)(9999.99) ++
        Seq.fill(20)(1.23456789e14))
    val rows = operators.Sketches.valueQuantileSketch(sp, mixed).collect()
    assert(rows.length == graft.functions.Kernels.QuantileGridPm.length)
    for (r <- rows) {
      val (rk, below, thru) = (r.getAs[Long]("r"),
        r.getAs[Long]("n_below"), r.getAs[Long]("n_thru"))
      assert(below < rk && rk <= thru, r.toString)
      val (lo, hi) = (r.getAs[Long]("est_lo"), r.getAs[Long]("est_hi"))
      if (lo >= (1L << graft.functions.Kernels.QSketchS))
        assert(hi - lo <= math.max(lo >> graft.functions.Kernels.QSketchS,
          1L), r.toString)
    }
    // q250/q500 land in the cents-1 bucket, q990 in the 1.23e16 octave
    val byQ = rows.map(r => r.getAs[Long]("q_pm") -> r).toMap
    assert(byQ(250L).getAs[Long]("est_lo") == 1L)
    assert(byQ(990L).getAs[Long]("est_lo") > 1000000000000000L)
    sp.catalog.clearCache(): Unit
  }
}
