package graft

import org.apache.spark.sql.functions._

/** Physical-plan regression guards: the properties §7's scale audit claims
  * (codegen'd narrow passes, pushdown reaching the scan, broadcast only on
  * bounded sides) asserted on the actual executed plans, so a refactor that
  * silently de-optimizes fails here instead of in a 100 TB run. */
class PlanSpec extends SparkSpec {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  /** Leaf kinds of the physical plan, NOT descending into cached relations —
    * an InMemoryTableScan is a leaf here, so "file" leaves are genuine
    * re-scans the cache failed to absorb. (toString-based checks over-count:
    * InMemoryRelation prints its cached subtree including its FileScan.) */
  private def scanLeavesOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _: InMemoryTableScanExec => Seq("mem")
      case _: FileSourceScanExec => Seq("file")
      case other => other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def scanLeaves(q: String): Seq[String] =
    scanLeavesOf(SparkEntry.queries(q)(spark, sf))

  test("narrow validation/text queries stay inside WholeStageCodegen") {
    // AQE finalizes the physical plan only on execution — run the query
    // through the noop sink, then inspect the final adaptive plan
    for (q <- Seq("q_validate_clients", "q_validate_details", "q_text_quality",
        "q_text_tokencount", "q_text_pii_scrub", "q_corpus_split")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // executes THIS QueryExecution so AQE finalizes it
      // FormattedMode tags codegen'd operators with "[codegen id : n]"
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("codegen id"), s"$q lost codegen:\n$plan")
    }
  }

  test("incremental sync pushes the date bound into the parquet scan") {
    val plan = graft.operators.Etl.incrementalSync(spark, sf, "1995-06-01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
  }

  test("asof event filters reach the scans") {
    val plan = planOf("q_events_asof")
    assert(plan.contains("EqualTo(event_type,click)") &&
      plan.contains("EqualTo(event_type,error)"), plan)
  }

  test("no forced broadcast on fact-scaled joins (customer/part/supplier)") {
    // the LOGICAL plans of the star-join queries must carry no broadcast
    // hint except via the fixed-size dims path (region/nation)
    for (q <- Seq("q_customer_stats", "q_top_products", "q_margin_analysis",
        "q3_top_unshipped", "q_validate_products",
        "q_segment_pivot", "q_customer_rfm", "q_customers_no_orders",
        "q_order_quantiles", "q_abc_classification", "q_order_intervals")) {
      val logical = SparkEntry.queries(q)(spark, sf)
        .queryExecution.analyzed.toString
      assert(!logical.contains("UnresolvedHint") &&
        !logical.toLowerCase.contains("broadcast"), s"$q forces a broadcast")
    }
  }

  test("lm coverage: vocabulary-scaled LM is hash-joined, never broadcast") {
    // both corpus-scaled joins carry shuffle_hash hints; at 100 TB a
    // planner-chosen broadcast of the LM (or of the per-doc score
    // relation) is the C33 failure mode — the finalized adaptive plan
    // must contain hash joins only
    val df = SparkEntry.queries("q_doc_lm_coverage")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("source overlap: cached gram set absorbs all three consumers") {
    // totals + pair-join a/b sides must all read the cached 16-byte
    // (gram_hash, source) relation — a "file" leaf means one consumer
    // silently re-derived the gram explode from parquet
    SparkEntry.queries("q_source_overlap")(spark, sf).collect()
    val leaves = scanLeaves("q_source_overlap")
    assert(!leaves.contains("file"), leaves.toString)
    assert(leaves.count(_ == "mem") >= 3, leaves.toString)
    spark.catalog.clearCache() // C52's cache contract: caller reclaims
  }

  test("novelty curve: cached occurrence grid absorbs both consumers") {
    // first-bucket mins + the join-back must both read the cached 16-byte
    // (gram_hash, bucket) grid; the only file leaves are the intentional
    // doc_id-only side scans (n_docs + the 1-row max broadcast)
    SparkEntry.queries("q_novelty_curve")(spark, sf).collect()
    val leaves = scanLeaves("q_novelty_curve")
    assert(leaves.count(_ == "mem") >= 2, leaves.toString)
    assert(leaves.count(_ == "file") <= 2, leaves.toString)
    spark.catalog.clearCache() // C71's cache contract: caller reclaims
  }

  test("quality classifier: narrow scan, no data shuffle") {
    val plan = planOf("q_quality_classifier")
    // presentation orderBy is the only exchange; no hash shuffle anywhere
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("substr dup spans: one span-grid shuffle, no pair join") {
    val plan = planOf("q_substr_dup_spans")
    // partial agg keyed on (span_hash, doc_id) + final span_hash agg ride
    // ONE hash exchange family; the ≥2-doc filter is post-aggregate, and
    // there is no join at all (span repeats never expand into pairs)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("ann serve: the bounded hit set broadcasts, documents never move") {
    // the O(batch·10) hit relation must be the broadcast build side; the
    // corpus-scaled documents scan stays a map-side probe
    val plan = planOf("q_ann_serve")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("frame dedup: pure aggregate — no join anywhere in the plan") {
    val plan = planOf("q_frame_dedup")
    assert(!plan.contains("Join"), plan)
  }

  test("semantic drift: cached side grid absorbs every consumer") {
    // totals, TV numerators, and the top-cluster window must all read the
    // cache()d ≤ sources·k grid, not re-run the assignment join
    SparkEntry.queries("q_semantic_drift")(spark, sf).collect()
    val leaves = scanLeaves("q_semantic_drift")
    assert(leaves.count(_ == "mem") >= 3, leaves.toString)
    spark.catalog.clearCache() // C78's cache contract: caller reclaims
  }

  test("stratified sample: rank limit pushes into a map-side group limit") {
    // the rnk <= k filter over row_number must plan as WindowGroupLimit —
    // the map-side per-stratum bottom-k prune that makes corpus-scaled
    // window partitions safe (shuffle carries ≤ tasks·strata·k rows)
    val plan = planOf("q_corpus_sample_stratified")
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("churn anti-join: date pushed to the orders scan, join stays anti") {
    val plan = planOf("q_customers_no_orders")
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
  }

  test("rollup expands grouping sets in one aggregate, not per-level scans") {
    // one Expand feeding one (partial+final) aggregate pair over one scan —
    // a per-level union would show several parquet scans of orders
    val plan = planOf("q_sales_rollup")
    assert(plan.contains("Expand"), plan)
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("chunking is shuffle-free up to the final presentation sort") {
    // the doc→chunk explode must stay a narrow Generate over the scan; the
    // only Exchange allowed is the global orderBy at the end
    val plan = planOf("q_doc_chunk")
    assert("Exchange".r.findAllIn(plan).length <= 1, plan)
    assert(plan.contains("Generate"), plan)
  }

  test("funnel windows share ONE user_id exchange") {
    // three staged conditional-min windows + the per-user collapse must all
    // ride the same hash partitioning: one Exchange before the windows, one
    // for the cohort roll-up, one for the final orderBy — never an exchange
    // per window stage
    val plan = planOf("q_funnel_conversion")
    assert("Window".r.findAllIn(plan).length == 3, plan)
    assert("Exchange".r.findAllIn(plan).length <= 3, plan)
  }

  test("admission report shares ONE cached feed across its four gates") {
    // round-7 advice: the C81 composition used to recompute the incoming
    // feed (a documents self-join) inside each of its four component
    // gates. The feed is now cache()d once — every gate's feed read is an
    // InMemoryTableScan leaf, and the only genuine file scans left are
    // the standing-corpus reads (incremental index, gram index, drift
    // base)
    val leaves = scanLeaves("q_admission_report")
    assert(leaves.count(_ == "mem") >= 4,
      s"expected >=4 cached-feed reads, saw $leaves")
    assert(leaves.count(_ == "file") <= 6,
      s"expected <=6 standing-corpus file scans, saw $leaves")
    spark.catalog.clearCache()
  }

  test("daily ETL report: the TOTAL row reads the cached steps, zero scans") {
    // A15 composes the 4 step rows + a total; the step relation is
    // cache()d, so the final plan's only leaves are two cache reads (the
    // steps branch and the total branch) — the validator subtrees are
    // never replayed (the C75 union-replay lesson)
    val leaves = scanLeaves("q_daily_etl_report")
    info(s"leaves=$leaves")
    assert(leaves.count(_ == "mem") == 2,
      s"expected the steps + total branches to read the cache, saw $leaves")
    assert(leaves.count(_ == "file") == 0,
      s"total row replayed validator scans: $leaves")
    spark.catalog.clearCache()
  }

  test("attribution computes the touch×purchase subtree once (3 scans)") {
    // round-7 plan audit: the per-model self-union recomputed the join +
    // both pick windows per branch (6 events scans). The unpivoted
    // single-pass shape reads events exactly 3 times: purchase amounts,
    // purchase join side, touches
    val leaves = scanLeaves("q_events_attribution")
    assert(leaves.count(_ == "file") == 3,
      s"expected exactly 3 events scans, saw $leaves")
  }

  test("containment rides the cached gram stream (no corpus re-scan)") {
    // C94 shares C4's cached (doc, source, gram) relation: sizes + both
    // pair-join sides read the cache; no file scan escapes it
    val leaves = scanLeaves("q_dedup_containment")
    info(s"leaves=$leaves")
    assert(leaves.count(_ == "mem") >= 3,
      s"expected >=3 cached gram reads, saw $leaves")
    assert(leaves.count(_ == "file") == 0,
      s"expected no corpus re-scan outside the cache, saw $leaves")
    spark.catalog.clearCache()
  }

  test("zipf profile reads the cached tf relation for both consumers") {
    val leaves = scanLeaves("q_text_zipf")
    info(s"leaves=$leaves")
    assert(leaves.count(_ == "mem") == 2,
      s"expected stats + head to read the tf cache, saw $leaves")
    assert(leaves.count(_ == "file") == 0, s"saw $leaves")
    spark.catalog.clearCache()
  }

  test("rrf fusion adds no scans beyond its two index searches") {
    // C96 must cost exactly its inputs: the C7 subtree reads embeddings
    // twice (probe + corpus sides), the C13 subtree four times (centroids
    // x2, assignment, probe cells) - fusion itself adds zero scans
    val lshLeaves = scanLeavesOf(operators.EmbeddingOps.annLsh(spark, sf))
    val ivfLeaves = scanLeavesOf(operators.EmbeddingOps.annIvf(spark, sf))
    val fusedLeaves = scanLeaves("q_retrieval_rrf")
    info(s"lsh=$lshLeaves ivf=$ivfLeaves fused=$fusedLeaves")
    assert(fusedLeaves.size == lshLeaves.size + ivfLeaves.size,
      s"fusion changed scan count: $fusedLeaves vs $lshLeaves + $ivfLeaves")
  }

  test("cohort retention reuses the custkey exchange for window + distinct") {
    val plan = planOf("q_cohort_retention")
    assert("Exchange".r.findAllIn(plan).length <= 3, plan)
  }

  test("corpus pack rides ONE source exchange up to the final sort") {
    // the packing window is the only required shuffle: one Exchange for the
    // per-source window, one for the global orderBy — a third would mean
    // the prefix-sum window stopped reusing the source partitioning
    val plan = planOf("q_corpus_pack")
    assert("Window".r.findAllIn(plan).length == 1, plan)
    assert("Exchange".r.findAllIn(plan).length <= 2, plan)
  }

  test("hier pack: two bounded windows, chunk bases broadcast back") {
    // the scale path must show exactly the two-pass shape: the within-chunk
    // window + the subtotal exclusive scan (2 Windows), with the subtotal
    // side reduced by an Aggregate BEFORE its window and re-joined as a
    // broadcast — a shuffle join here would mean the fact side re-keys on
    // (source, chunk) a second time
    val plan = planOf("q_corpus_pack_hier")
    assert("Window".r.findAllIn(plan).length == 2, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("HashAggregate".r.findAllIn(plan).length >= 1, plan)
  }

  test("gapfill joins only post-aggregation cardinality") {
    // both join inputs must read the CACHED (type, hour) aggregate — a raw
    // FileScan in the top-level plan would mean the events table is
    // re-scanned for one of the branches
    val leaves = scanLeaves("q_events_gapfill")
    assert(!leaves.contains("file") && leaves.contains("mem"), leaves)
    assert(planOf("q_events_gapfill").contains("Generate")) // sequence explode
  }

  test("basket pair expansion is narrow over ONE orderkey shuffle") {
    // pair generation must be Generate (array explode) over the cached
    // basket aggregate — a join-shaped expansion would re-scan or
    // re-shuffle the fact-scaled order-part relation per side
    val leaves = scanLeaves("q_part_affinity")
    assert(!leaves.contains("file") && leaves.contains("mem"), leaves)
    assert(planOf("q_part_affinity").contains("Generate"))
  }

  test("supplier scorecard: fact shuffles only for the two-phase distinct") {
    // the lineitem scan must reach the final per-suppkey aggregate through
    // AT MOST the two distinct-phase exchanges ((suppkey, partkey) then
    // suppkey) plus the presentation sort — a fourth data exchange would
    // mean the dims stopped broadcasting or an extra fact reshuffle
    val plan = planOf("q_supplier_scorecard")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2, plan)
  }

  test("ABC classes: fact partial-aggregates to catalog rows before windows") {
    // the cumulative windows must sit ABOVE the per-part aggregate — a
    // Window directly over the lineitem scan would sort fact-scaled rows
    val plan = planOf("q_abc_classification")
    val aggIdx = plan.indexOf("HashAggregate")
    val winIdx = plan.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < plan.lastIndexOf("HashAggregate"),
      plan)
    assert("Window".r.findAllIn(plan).length == 2, plan)
  }

  test("cohort LTV: both branches read the cached customer-month relation") {
    // the month grid and the cohort-size count must consume the ONE cached
    // windowed customer-month relation — a file leaf in the top-level plan
    // means a branch re-scanned orders and repeated the custkey window
    val leaves = scanLeaves("q_cohort_ltv")
    assert(!leaves.contains("file") && leaves.contains("mem"), leaves)
  }

  test("edit distance reuses the cached simhash-band relation on every side") {
    // four consumers of the band relation (both pair-join sides + their
    // hot-bucket prunes) must all read the ONE cache; the only file leaves
    // are the two text joins — more means a band consumer re-ran the
    // simhash kernel scan, fewer means a text side vanished
    val leaves = scanLeaves("q_dedup_edit_distance")
    assert(leaves.count(_ == "mem") == 4, leaves)
    assert(leaves.count(_ == "file") == 2, leaves)
  }

  test("minhash LSH pair join reads only the cached signature relation") {
    // all four signature consumers (pair sides + hot prunes) hit the cache
    // and NO branch re-scans the corpus: text must never be read twice
    val leaves = scanLeaves("q_dedup_minhash_lsh")
    assert(!leaves.contains("file"), leaves)
    assert(leaves.count(_ == "mem") == 4, leaves)
  }

  test("quantize and frames stay narrow (no data shuffle before the sort)") {
    for (q <- Seq("q_embed_quantize", "q_multimodal_frames")) {
      val plan = planOf(q)
      assert(!plan.contains("Exchange hashpartitioning"), s"$q:\n$plan")
    }
  }

  test("sketch aggregates partial-aggregate map-side") {
    // both the CMS and HLL aggregates must show a partial_ aggregate pass
    // (objHashAggregate partial before the exchange) — the whole point of a
    // mergeable sketch is map-side combine
    for (q <- Seq("q_events_cms", "q_events_hll")) {
      val plan = planOf(q)
      assert(plan.contains("partial_graft_cms_sketch")
        || plan.contains("partial_graft_hll_sketch")
        || plan.contains("partial_countminsketchagg")
        || plan.contains("partial_hllsketchagg"), s"$q:\n$plan")
    }
  }

  test("incremental dedup: index sigs cached, batch joins never corpus²") {
    // the standing-index sig relation must absorb BOTH its consumers (the
    // hot-bucket count and the anti-join probe) — a file leaf there means
    // the corpus was re-signed; the five file leaves are the exact-hash
    // scan (1) plus the batch feed's two id-keyed scans, read for the
    // hash pass and the sig pass (2+2)
    val leaves = scanLeaves("q_dedup_incremental")
    assert(leaves.count(_ == "mem") == 2, leaves)
    assert(leaves.count(_ == "file") == 5, leaves)
  }

  test("canonical keeper aggregates map-side, no keeper window") {
    // the keeper argmax must be a partial-aggregating struct-MAX — a
    // Window-based argmax would sort whole clusters; the single Window in
    // the plan is C18's component_size count, keyed on the cluster label
    val plan = planOf("q_dedup_canonical")
    assert("Window".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("partial_max"), plan)
  }

  test("kmeans: every round reads the cached vector relation") {
    // in the REPORT plan the cached final assignment absorbs the whole
    // training subtree (2 mem leaves: assignment + sizes); the TRAINING
    // dataflow is pinned separately — since the round-16 fused argmin
    // (assignment rides the update pass as a map-side kernel over the
    // 1-row broadcast codebook) each Lloyd round reads the ONE cached
    // embeddings relation exactly once, plus the seed read: iters + 1 =
    // 3 mem leaves, never a corpus parquet re-scan and never MORE reads
    // than rounds (a 4th mem leaf would mean the fusion regressed to a
    // separate assignment pass)
    val report = scanLeaves("q_embed_kmeans")
    assert(!report.contains("file") && report.count(_ == "mem") == 2, report)
    val training = scanLeavesOf(
      graft.operators.EmbeddingOps.kmeansCentroids(spark, sf))
    assert(!training.contains("file"), training)
    assert(training.count(_ == "mem") == 3, training)
    spark.catalog.clearCache(): Unit
  }

  test("mix epochs: one cached token pass feeds total and report") {
    // the corpus is scanned ONCE (inside the cached source-totals
    // materialization); the broadcast total and the final report both
    // read the cache — a file leaf means a branch re-ran the token scan
    val leaves = scanLeaves("q_mix_epochs")
    assert(!leaves.contains("file") && leaves.count(_ == "mem") == 2, leaves)
  }

  test("threshold sweep: one cached histogram pass, no window") {
    // the corpus collapses ONCE into the cached SweepN-row bucket
    // histogram; the triangular grid join and the broadcast totals both
    // read the cache — a file leaf means a per-candidate corpus rescan,
    // and a Window would be the reverse-cumulative global-window hazard
    // the triangular join exists to avoid
    val leaves = scanLeaves("q_filter_threshold_sweep")
    assert(!leaves.contains("file") && leaves.count(_ == "mem") == 2, leaves)
    assert(!planOf("q_filter_threshold_sweep").contains("Window"),
      planOf("q_filter_threshold_sweep"))
  }

  test("gram memorization: cached occurrence grid feeds totals and flags") {
    // the gram explosion collapses ONCE into the cached (gram_hash,
    // source) occurrence grid; the corpus-wide totals and the hot-flag
    // join both read the cache — a file leaf means the explode ran twice
    val leaves = scanLeaves("q_gram_memorization")
    assert(!leaves.contains("file") && leaves.count(_ == "mem") == 2, leaves)
  }

  test("doc repetition: shuffle-free per-doc pass") {
    // the per-doc modes come from row-local sorted-run folds, not a
    // per-(doc, gram) aggregation — the only allowed Exchange is the
    // final presentation orderBy
    val plan = planOf("q_doc_repetition")
    assert("Exchange".r.findAllIn(plan).length <= 1, plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("corpus shard: one cached manifest agg feeds total and report") {
    // the corpus is scanned ONCE (inside the cached NumShards-row
    // manifest); the broadcast token total and the report both read the
    // cache — a file leaf means a branch re-ran the full routing pass
    val leaves = scanLeaves("q_corpus_shard")
    assert(!leaves.contains("file") && leaves.count(_ == "mem") == 2, leaves)
  }

  test("runtime bloom-filter join pruning fires under the session contract") {
    // GraftSession pins spark.sql.optimizer.runtime.bloomFilter.enabled as
    // part of the 100 TB story (a selective dimension side injects a bloom
    // filter into the fact scan, pruning shuffle input at the source) —
    // this PROVES the optimizer actually injects it on this session's
    // configs instead of assuming: size thresholds are lowered so a
    // test-sized fact side crosses the same ratios a 100 TB scan crosses
    // in production, then the shuffle join's fact side must carry a
    // might_contain probe fed by a bloom_filter_agg subquery.
    val sp = spark
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> sp.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => sp.conf.set(k, v) }
    try {
      val docs = graft.sources.Tables.documents(sp, sf)
      val dim = docs.filter(col("source") === "src3")
        .select(col("doc_id").as("k"))
      val joined = docs.join(dim, docs("doc_id") === dim("k"))
        .select(col("doc_id"), col("text"))
      val plan = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("might_contain") || plan.contains("bloomfilter"),
        s"runtime bloom filter was not injected:\n$plan")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => sp.conf.set(k, v)
      case (k, None) => sp.conf.unset(k)
    }
  }
  test("round-8 final additions: scan shapes") {
    // C100: the chunk pass collapses ONCE into the cached (chunk_hash,
    // source) cell grid; both sides of the hash self-join read the cache
    val m = scanLeaves("q_dup_source_matrix")
    assert(!m.contains("file") && m.count(_ == "mem") == 2, m)
    // C101: the minima grid is cached; stats, the top-count rollup and
    // the modal re-join are its three consumers
    val h = scanLeaves("q_minhash_row_health")
    assert(!h.contains("file") && h.count(_ == "mem") == 3, h)
    // C103: one narrow pass, no cache needed — exactly one file scan
    val x = scanLeaves("q_minhash_cross_row_agreement")
    assert(x == Seq("file"), x)
    // B43: orders + customer, each scanned exactly once
    val g = scanLeaves("q_segment_migration")
    assert(g.count(_ == "file") == 2 && !g.contains("mem"), g)
    // C102: five cached key-count relations, two consumers each
    val a = scanLeaves("q_skew_audit")
    assert(!a.contains("file") && a.count(_ == "mem") == 10, a)
    // C104: every branch reads the cached 64-row diagonal, never a file
    val v = scanLeaves("q_embed_subspace_variance")
    assert(!v.contains("file") && v.count(_ == "mem") >= 4, v)
    spark.catalog.clearCache(): Unit
  }

  test("sweep quartet (C89/C91/C93/C98): scan shapes") {
    // C89: the whole heavy subtree (staged pair artifacts + gram joins)
    // collapses inside the cached 1-row `tot` (the C75 cell device) — the
    // 3 report rows are its only leaves
    val pp = scanLeaves("q_dedup_pair_precision")
    assert(!pp.contains("file") && pp.count(_ == "mem") == 3, pp)
    // C91: candidates scored ONCE (cached, with the cached inverted file
    // inside) — the 4 sweep points read the scored cache; the only file
    // scans are the probe side + the centroid pass, exactly as C13 deploys
    val np = scanLeaves("q_ann_nprobe_sweep")
    assert(np.count(_ == "mem") == 2 && np.count(_ == "file") == 2, np)
    // C93: ONE shingle pass (cached minima, both self-join sides) and ONE
    // gram-set pass (cached, both verifier sides) — 4 cache reads per
    // config, and the corpus text is never re-scanned per config (the
    // uncached round-8 shape re-tokenized documents 8 times)
    val bs = scanLeaves("q_dedup_banding_sweep")
    assert(!bs.contains("file") && bs.count(_ == "mem") == 16, bs)
    // C98: the C14 candidate set is computed once (cached) and the scored
    // sample once (cached) — every radius point reads caches only
    val rs = scanLeaves("q_simhash_radius_sweep")
    assert(!rs.contains("file") && rs.count(_ == "mem") == 8, rs)
    spark.catalog.clearCache(): Unit
  }

  test("span-mask family and star-schema additions: scan shapes") {
    // C106: the anchored-occurrence relation is cached ONCE for its three
    // consumers (plan rows, dup set, keeper mins) — no file re-scan
    val p = scanLeaves("q_span_mask_plan")
    assert(!p.contains("file") && p.count(_ == "mem") == 3, p)
    // C107/C108: the same 3 cached reads plus exactly ONE corpus scan for
    // the doc-token (C107) / source (C108) side
    val c = scanLeaves("q_mask_coalesce")
    assert(c.count(_ == "file") == 1 && c.count(_ == "mem") == 3, c)
    val d = scanLeaves("q_mask_datasheet")
    assert(d.count(_ == "file") == 1 && d.count(_ == "mem") == 3, d)
    // B44-B47: each is ONE pass over its two tables — two file scans, no
    // self-join, no cache needed
    for (q <- Seq("q_promo_revenue_share", "q_small_qty_revenue",
        "q_priority_fulfilment", "q_supplier_breadth")) {
      val s = scanLeaves(q)
      assert(s.count(_ == "file") == 2 && !s.contains("mem"), s"$q: $s")
    }
    // C109: the 4-row grid is cached for its two consumers (output +
    // 1-row total) — the C55 assignment subtree runs once, inside the
    // cached relation, never per branch
    val q9 = scanLeaves("q_embed_pq_distortion")
    assert(!q9.contains("file") && q9.count(_ == "mem") == 2, q9)
    // C110: a single corpus pass — chunk votes collapse in-pipeline
    val lm = scanLeaves("q_doc_lang_mix")
    assert(lm == Seq("file"), lm)
    // C111: every leaf is a cache read — the sampled gram sets (truth's
    // two sides + the sample count) and the C2 signature cache (its own
    // internal materialization, both join sides + the hot screen) — the
    // corpus text is never re-scanned for the report
    val rc = scanLeaves("q_dedup_lsh_recall")
    assert(!rc.contains("file") && rc.count(_ == "mem") == 7, rc)
    // C112: the three bounded lists are cached; each pair branch reads
    // only caches (probes union: 2, intersection join: 2) — no search
    // plan replays across the three report branches
    val ov = scanLeaves("q_ann_overlap")
    assert(!ov.contains("file") && ov.count(_ == "mem") == 12, ov)
    spark.catalog.clearCache(): Unit
  }

  test("repeated-scan audit catches the C93 replay shape, clears on cache") {
    // reconstruct the C93 pre-fix shape: a derived token relation consumed
    // by a per-config union loop WITHOUT cache — every branch replays the
    // whole tokenize subtree, so the corpus file is scanned once per config
    def sweepOver(grams: org.apache.spark.sql.DataFrame) =
      Seq(2, 3, 4, 5).map { k =>
        grams.filter(length(col("t")) >= k)
          .agg(count(lit(1)).as("n")).select(lit(k.toLong).as("k"), col("n"))
      }.reduce(_ unionByName _)
    val grams = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    val uncached = sweepOver(grams)
    assert(Audit.factScanCounts(uncached).getOrElse("documents", 0) >= 4,
      Audit.factScanCounts(uncached).toString)
    assert(Audit.repeatedScanHazards(uncached)
      .exists(_.startsWith("repeated-scan:documents")),
      "the audit must flag the uncached sweep")
    // cache() collapses the replay: ONE materialization, counted once
    val shared = grams.cache()
    try {
      val cached = sweepOver(shared)
      assert(Audit.factScanCounts(cached).getOrElse("documents", 0) <= 1,
        Audit.factScanCounts(cached).toString)
      assert(Audit.repeatedScanHazards(cached).isEmpty)
    } finally { shared.unpersist(): Unit }
  }

  test("round-10 pins: sketch sweeps, HH screen, venn, salted agg shapes") {
    import graft.operators.Sketches
    // B48: one events scan builds every m's registers + one narrow exact
    // COUNT(DISTINCT) pass (round 13: deliberately NOT fused — the fused
    // distinct keyed the partial aggregate on event_id and allocated
    // every sketch's register buffers per distinct group, 53x work at 8x
    // data in the inflation sweep); the 1-row cross-joined result is
    // cached and each per-m row reads the cache
    val sw = scanLeaves("q_hll_m_sweep")
    assert(!sw.contains("file") &&
      sw.count(_ == "mem") == Sketches.HllSweepMs.length, sw)
    assert(Audit.factScanCounts(
      SparkEntry.queries("q_hll_m_sweep")(spark, sf))
      .getOrElse("events", 0) == 2,
      "B48 must build all sketches in one scan + one exact-distinct pass")
    spark.catalog.clearCache()
    // B49: ONE scan builds ALL geometries' sketches + one narrow
    // true-count pass — never a scan per geometry
    val cg = SparkEntry.queries("q_cms_geometry_sweep")(spark, sf)
    assert(Audit.factScanCounts(cg).getOrElse("events", 0) == 2,
      Audit.factScanCounts(cg).toString)
    // B50: the cold bulk dies map-side — the screen filter sits UNDER the
    // one confirm-groupBy exchange (no shuffle before the confirm), and
    // the sketch rides in as a broadcast
    val hh = SparkEntry.queries("q_cms_heavy_hitters")(spark, sf)
    val hhPlan = hh.queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(hhPlan).length
    assert(hashExchanges == 1, s"expected 1 confirm exchange:\n$hhPlan")
    val belowConfirm = hhPlan.substring(
      hhPlan.indexOf("Exchange hashpartitioning"))
    assert(belowConfirm.contains("array_min") &&
      belowConfirm.contains("BroadcastNestedLoopJoin")
      || belowConfirm.contains("BroadcastExchange"),
      s"screen must run under the confirm exchange:\n$hhPlan")
    assert(Audit.factScanCounts(hh).getOrElse("events", 0) == 2,
      "B50 = one sketch pass + one screened pass")
    // B51: ONE cached (month, customer) relation feeds sketches (both
    // pair sides) and the exact evaluation self-join — orders is read
    // from file exactly once, at cache materialization
    val vn = scanLeaves("q_hll_month_overlap")
    assert(!vn.contains("file") && vn.count(_ == "mem") == 4, vn)
    assert(Audit.factScanCounts(
      SparkEntry.queries("q_hll_month_overlap")(spark, sf))
      .getOrElse("orders", 0) == 1)
    spark.catalog.clearCache()
    // C113: the two-phase salted aggregate is exactly two key exchanges —
    // (key, salt) partials then key merge — plus nothing else
    val sa = SparkEntry.queries("q_skew_salted_agg")(spark, sf)
    val saPlan = sa.queryExecution.executedPlan.toString
    val saExchanges = "Exchange hashpartitioning".r
      .findAllIn(saPlan).length
    assert(saExchanges == 2, s"expected the 2-phase shape:\n$saPlan")
    assert(Audit.factScanCounts(sa).getOrElse("events", 0) == 1,
      "C113 is one events pass")
  }

  test("quantile sketch family pins: one scan each, cached readouts") {
    // B52: ONE events pass builds the sketch; the readout's histogram and
    // quantile grid both read the cached 1-row relation
    val b52 = SparkEntry.queries("q_value_quantile_sketch")(spark, sf)
    assert(Audit.factScanCounts(b52).getOrElse("events", 0) == 1)
    val l52 = scanLeavesOf(b52)
    assert(!l52.contains("file") && l52.count(_ == "mem") >= 2, l52)
    spark.catalog.clearCache()
    // B53: ONE scan builds EVERY geometry's counts (the B48 device) —
    // each s's readout (hist + grid + cell stats) reads the cache
    val b53 = SparkEntry.queries("q_qsketch_s_sweep")(spark, sf)
    assert(Audit.factScanCounts(b53).getOrElse("events", 0) == 1,
      "B53 must build all geometries in one scan")
    val l53 = scanLeavesOf(b53)
    assert(!l53.contains("file") &&
      l53.count(_ == "mem") >= operators.Sketches.QSketchSweepSs.length * 2,
      l53)
    spark.catalog.clearCache()
    // B54 grouped / B55 per-day drift / B56 week register-sum merge: one
    // events pass each (B56's merge sits ABOVE the per-day aggregate)
    for (q <- Seq("q_value_quantiles_by_type", "q_value_quantile_drift",
        "q_value_quantile_week")) {
      val df = SparkEntry.queries(q)(spark, sf)
      assert(Audit.factScanCounts(df).getOrElse("events", 0) == 1,
        s"$q must be one events pass")
      spark.catalog.clearCache()
    }
    // B57/B58 week merges: sketch-build pass + exact-evaluation pass, two
    // events scans, never a per-week rescan
    for (q <- Seq("q_cms_week_merge", "q_hll_week_actives")) {
      val df = SparkEntry.queries(q)(spark, sf)
      assert(Audit.factScanCounts(df).getOrElse("events", 0) == 2,
        s"$q must be sketch pass + evaluation pass: " +
          s"${Audit.factScanCounts(df)}")
      spark.catalog.clearCache()
    }
    // B59/C114: the sketch on the other two fact domains — one pass each
    for ((q, t) <- Seq(("q_order_value_quantiles_by_month", "orders"),
        ("q_doclen_quantiles_by_source", "documents"))) {
      val df = SparkEntry.queries(q)(spark, sf)
      assert(Audit.factScanCounts(df).getOrElse(t, 0) == 1,
        s"$q must be one $t pass: ${Audit.factScanCounts(df)}")
      spark.catalog.clearCache()
    }
  }

  test("band revenue (B63): disjunction residues reach both scans") {
    // the Q19 shape's defining plan property (round 14 — the round-13
    // CASE-null form pushed only IsNotNull): the brand-set × size-range
    // union must reach the part scan and the quantity-range union the
    // lineitem scan, each as an Or(And(...)) in PushedFilters. Formatted
    // mode — the simple toString truncates the PushedFilters list.
    val plan = SparkEntry.queries("q_band_revenue")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("In(p_brand, [Brand#11,Brand#12,Brand#13])") &&
      plan.contains("In(p_brand, [Brand#20,Brand#24,Brand#25])"),
      s"brand residue missing from the part scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(p_size,20)"),
      s"size residue missing from the part scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      plan.contains("LessThanOrEqual(l_quantity,50.0)"),
      s"quantity residue missing from the lineitem scan:\n$plan")
    // the pushed residues are DISJUNCTIONS, not conjunct fragments
    assert(plan.contains("Or(Or(And("),
      s"residues no longer push as the OR-of-ANDs:\n$plan")
  }

  test("round-13 additions (C118-C121): materialization shapes") {
    // C118: the health panel reads INDEX parquet only — no cache is the
    // intended shape here (each consumer prunes its own column subset of
    // a bounded artifact; pinning the panel's working set in memory would
    // cost O(index) residency for a one-shot read). The pin is the scan
    // BUDGET: every leaf is an artifact file read, none corpus-scaled,
    // and the count stays at the audited consumer count — more means a
    // family view silently gained a re-derivation
    val st = scanLeaves("q_stream_index_stats")
    info(s"C118 leaves=$st")
    assert(!st.contains("mem"), st.toString)
    assert(st.count(_ == "file") == 7, st.toString)
    spark.catalog.clearCache()
    // C119: every leaf is a cache read — the C2 edge cache absorbs the
    // count + self-join + semi-join consumers (exchange reuse collapses
    // the sampled adjacency's two sides onto one subtree) and the wedge
    // cache its two; the corpus text is never re-scanned for the census
    val tr = scanLeaves("q_dedup_transitivity")
    info(s"C119 leaves=$tr")
    assert(!tr.contains("file"), tr.toString)
    assert(tr.count(_ == "mem") == 4, tr.toString)
    spark.catalog.clearCache()
    // C120: the cached ≤5-row bucket grid absorbs BOTH its consumers
    // (output rows + the 1-row total) — the round-14 catch was exactly
    // this grid uncached, replaying the whole C18 loop + doc join per
    // crossJoin branch (4 documents scans where 2 belong)
    val lb = scanLeaves("q_dup_length_bias")
    info(s"C120 leaves=$lb")
    assert(!lb.contains("file"), lb.toString)
    assert(lb.count(_ == "mem") == 2, lb.toString)
    spark.catalog.clearCache()
    // C121: ONE cached distinct (source, term) relation absorbs all four
    // consumers (both pair-join sides + the ≤sources-row sizes aggregate,
    // re-derived off the cache once per join side) — a file leaf means
    // the token explode ran twice
    val ov = scanLeaves("q_source_vocab_overlap")
    info(s"C121 leaves=$ov")
    assert(!ov.contains("file"), ov.toString)
    assert(ov.count(_ == "mem") == 4, ov.toString)
    spark.catalog.clearCache(): Unit
  }

  test("audit's cartesian sweep catches constructed regressions") {
    val docs = sources.Tables.documents(spark, sf).select("doc_id")
    val events = sources.Tables.events(spark, sf).select("event_id")
    // a genuine CartesianProduct over two unreduced fact sides (broadcast
    // disabled so the tiny test tables can't hide it behind a BNLJ)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cart = docs.crossJoin(events)
      assert(Audit.cartesianHazards(cart) ==
        Seq("cartesian-over-fact:documents", "cartesian-over-fact:events"),
        Audit.cartesianHazards(cart))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // a BNLJ whose BUILD side is unreduced fact-derived — the forced
    // driver materialization of a corpus-scaled side
    val bn = broadcast(docs).crossJoin(events)
    assert(Audit.cartesianHazards(bn) == Seq("bnlj-broadcast-fact:documents"),
      Audit.cartesianHazards(bn))
    // the scalar-join device is NOT flagged: the broadcast side reduces
    // through an aggregate, and the fact side merely STREAMS the loop
    val safe = docs.crossJoin(
      broadcast(sources.Tables.events(spark, sf).agg(count(lit(1)).as("n"))))
    assert(Audit.cartesianHazards(safe).isEmpty, Audit.cartesianHazards(safe))
  }

  test("driver-job gate (Audit hazard 6): real loop within bound, " +
      "constructed runaway breaches") {
    // the gated iterative operator stays within its vetted bound at the
    // spec SF (bounds are measured at sf0.01 — a smaller corpus never
    // needs MORE convergence rounds)
    val real = Audit.jobsOf(spark,
      operators.DedupOps.dedupComponents(spark, sf))
    assert(real <= Audit.iterativeJobBounds("q_dedup_components"),
      s"components spent $real driver jobs at sf0.001")
    // a constructed convergence regression — a driver loop scheduling one
    // job per round for 3x a vetted bound (the frontier that never
    // shrinks) — must land ABOVE the gate; this is the failure mode the
    // class exists to catch, invisible to every plan-based hazard
    val bound = Audit.iterativeJobBounds("q_embed_pca_power")
    val runaway = Audit.jobsOf(spark, {
      val df = spark.range(10).toDF("node")
      (1 to bound * 3).foreach(_ => { df.count(): Unit })
      df
    })
    assert(runaway > bound,
      s"runaway loop counted only $runaway jobs (bound $bound)")
  }

  test("supplier blame (B64): one orderkey shuffle carries join+agg+window") {
    // the Q21 collapse's plan property: with broadcast competition
    // disabled (so the tiny test inputs plan like 100 TB inputs — SMJ on
    // the fact join), the orderkey partitioning is paid ONCE per join
    // input and REUSED by both the (orderkey, suppkey) aggregate and the
    // per-order window — a third orderkey exchange means the ride broke
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = graft.operators.Analytics.supplierBlame(spark, sf)
        .queryExecution.executedPlan.toString
      val okEx = "Exchange hashpartitioning\\([^)]*orderkey".r
        .findAllIn(plan).length
      assert(okEx == 2, s"orderkey exchanges $okEx != 2 (join inputs):\n$plan")
      val skEx = "Exchange hashpartitioning\\([^)]*suppkey".r
        .findAllIn(plan).length
      assert(skEx == 2, s"suppkey exchanges $skEx != 2 (dim join):\n$plan")
      assert(plan.contains("Window"), plan)
      // the status filter reaches the orders scan; nation stays broadcast
      assert(plan.contains("EqualTo(o_orderstatus,F)"), plan)
      assert(plan.contains("BroadcastExchange"), plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev): Unit
  }

  test("B64/B65 scan budgets (the standing materialization audit)") {
    // B64: one orders scan + one lineitem scan + the two dim scans —
    // the window/agg collapse must never re-derive the fact join
    val sb = scanLeaves("q_supplier_blame")
    info(s"B64 leaves=$sb")
    assert(!sb.contains("mem") && sb.count(_ == "file") == 4, sb.toString)
    spark.catalog.clearCache()
    // B65: customer scanned TWICE by design (the 1-row stats aggregate
    // re-scans the pruned dim rather than pinning a cache for a one-shot
    // report — the B29 audit-scalar device) + one orders scan; a THIRD
    // customer leaf means the scalar device gained a re-derivation
    val ih = scanLeaves("q_idle_high_balance")
    info(s"B65 leaves=$ih")
    assert(!ih.contains("mem") && ih.count(_ == "file") == 3, ih.toString)
    spark.catalog.clearCache(): Unit
  }

  test("idle high balance (B65): pushdown, pruning, scalar broadcast, anti") {
    val df = graft.operators.Analytics.idleHighBalance(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the idleness horizon prunes the orders scan at the source
    assert(plan.contains("GreaterThanOrEqual(o_orderdate,2001-01-01"), plan)
    // the 1-row positive-balance stats ride a broadcast loop join (the
    // B29 scalar device), never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftAnti"), plan)
    // column pruning: the customer scan reads 3 columns only
    assert(!plan.contains("c_mktsegment") && !plan.contains("c_nationkey"),
      plan)
  }

  test("customer distribution (B66): one fact exchange, pushed bound, left") {
    // the Q13 plan property: orders pre-aggregate BEFORE the join, and
    // the join reuses the aggregate's custkey partitioning — so with
    // broadcast competition off (small inputs plan like 100 TB inputs)
    // there are exactly TWO custkey exchanges (orders agg + customer); a
    // third means the fact started shuffling raw order rows post-join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = graft.operators.Analytics
        .customerOrderDistribution(spark, sf)
        .queryExecution.executedPlan.toString
      val ck = "Exchange hashpartitioning\\([^)]*custkey".r
        .findAllIn(plan).length
      assert(ck == 2, s"custkey exchanges $ck != 2:\n$plan")
      // the qualifier restricts which orders COUNT (input filter = ON
      // clause for a left join) and reaches the parquet scan
      assert(plan.contains("GreaterThanOrEqual(o_orderdate,2001-01-01"), plan)
      // the zero bucket survives: the join stays LEFT OUTER
      assert(plan.contains("LeftOuter"), plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev): Unit
  }

  test("top supplier revenue (B67): argmax scalar, one fact pass, no window") {
    val df = graft.operators.Analytics.topSupplierRevenue(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the 1-row MAX joins back broadcast — Catalyst folds the
    // crossJoin+filter into an EQUALITY BroadcastHashJoin on
    // rev_u = max_u (a hash probe, tighter than the BNLJ the device
    // writes); an argmax via global window would serialize every
    // supplier through one partition
    assert(plan.contains("BroadcastHashJoin [rev_u"), plan)
    assert(plan.contains("Cross, BuildRight"), plan)
    assert(!plan.contains("Window"), plan)
    // the quarter bound reaches the (single) lineitem materialization
    assert(plan.contains("GreaterThanOrEqual(l_shipdate,1996-01-01"), plan)
    // the per-supplier aggregate is cached and read twice; the fact scan
    // happens ONCE inside it — 2 mem leaves + the supplier dim file scan
    val lv = scanLeavesOf(df)
    info(s"B67 leaves=$lv")
    assert(lv.count(_ == "mem") == 2 && lv.count(_ == "file") == 1,
      lv.toString)
    spark.catalog.clearCache(): Unit
  }

}
