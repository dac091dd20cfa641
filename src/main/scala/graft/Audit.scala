package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.window.WindowExec

/** Dev tool: whole-surface plan hazard sweep. For every registered query,
  * flags the two shapes that pass local tests but die at 100 TB:
  *
  *  - an EXPLICIT `broadcast()` hint over a subtree that scans a FACT
  *    table (orders / lineitem / events / documents / embeddings) with no
  *    aggregate reduction below the hint — the build side scales with the
  *    data, so the forced driver-side build OOMs at scale. (Planner-chosen
  *    broadcasts are NOT flagged: AQE re-decides them per scale. Hinted
  *    subtrees that are filter-bounded — probe batches, centroid caps,
  *    eval slices — are vetted in [[knownBounded]], justification in the
  *    operator's scaladoc.)
  *  - a Window with an empty partition spec — every row lands in ONE
  *    partition; fine only when the input is provably bounded (catalog,
  *    histogram, matrix), vetted the same way.
  *  - a RUNNING-aggregate Window (ordered, UnboundedPreceding frame)
  *    whose child scans a FACT table with no aggregate reduction below —
  *    one window partition = one task sequentially scanning every row of
  *    its key (the q_corpus_pack-shaped hazard: a per-source prefix sum
  *    puts a whole source in one task at 100 TB). Keys whose partitions
  *    are bounded by construction (chunk ids, per-user sessions with
  *    upstream bot screening) are vetted in [[knownBounded]].
  *
  * Anything NEW is a regression to investigate. Run:
  * `sbt "runMain graft.Audit"`. */
object Audit {

  private val factTables =
    Set("orders", "lineitem", "events", "documents", "embeddings")

  /** (query, hazard) pairs audited as fine — see each operator's scaladoc. */
  val knownBounded: Set[(String, String)] = Set(
    // catalog-bounded cumulative windows (one row per part before the sort)
    ("q_abc_classification", "global-window"),
    // histogram-bounded cumulative window (distinct cents values)
    ("q_order_quantiles_hist", "global-window"),
    // ≤ types² transition matrix / ≤ langs² confusion matrix windows
    ("q_events_markov", "global-window"),
    ("q_text_lang_confusion", "global-window"),
    // calendar-bounded monthly feature matrix
    ("q_sales_forecast_features", "global-window"),
    // C102: the rank window runs AFTER a limit(SkewTopK) — ≤ 3 rows per
    // family by construction (TakeOrderedAndProject does the real top-k)
    ("q_skew_audit", "global-window"),
    // C86: the global window runs over the quality-bucket HISTOGRAM
    // (bounded grid, ≤ distinct floor(q·10^6) values), and the running
    // fact window is filtered to the ONE boundary bucket b* before the
    // sort — a corpus where b* is still too large recurses the same
    // histogram split at finer scale (documented in the scaladoc)
    ("q_token_budget_fill", "global-window"),
    ("q_token_budget_fill", "running-window-over-fact:documents"),
    // ANN probe batches: vec_id % 100 under a fixed cap (ProbeBatch) —
    // filter-bounded, no aggregate, O(batch) at any corpus size
    ("q_ann_bruteforce", "hinted-fact-broadcast:embeddings"),
    ("q_ann_lsh", "hinted-fact-broadcast:embeddings"),
    ("q_ann_ivf", "hinted-fact-broadcast:embeddings"),
    ("q_ann_recall_report", "hinted-fact-broadcast:embeddings"),
    // C91 inherits C13's shape: the broadcast sides are the O(IvfK)
    // centroid set and the (ProbeBatch × nprobe_max)-bounded probe-cell
    // set — both fixed-size at any corpus scale
    ("q_ann_nprobe_sweep", "hinted-fact-broadcast:embeddings"),
    // C96 fuses the C7 + C13 lists: same probe-batch / centroid-capped
    // broadcast subtrees, bounded by construction (see those scaladocs)
    ("q_retrieval_rrf", "hinted-fact-broadcast:embeddings"),
    // C97's cumulative pass runs over the <= VocabBuckets-row grid (an
    // aggregate of the corpus, bounded by the decile rule)
    ("q_vocab_growth", "global-window"),
    ("q_ann_hard_negatives", "hinted-fact-broadcast:embeddings"),
    // C74 serving: inherits C6's probe broadcast, plus the O(batch·10)
    // hit-set broadcast for the doc fetch — both fixed-size at any scale
    ("q_ann_serve", "hinted-fact-broadcast:embeddings"),
    // C85 MaxSim: the same filter-bounded probe-batch broadcast as C6
    // (vec_id % 100 under the ProbeBatch cap) — the corpus side reduces
    // map-side to the bounded (probe × label) grid right after the scan
    ("q_retrieval_maxsim", "hinted-fact-broadcast:embeddings"),
    // IVF centroid set: vec_id ≡ 50 (mod 100) under the IvfK cap
    ("q_semantic_dedup", "hinted-fact-broadcast:embeddings"),
    // C53 cell balance: the same O(IvfK) centroid broadcast as C13, plus
    // a broadcast 1-row grand total — both fixed-size at any corpus scale
    ("q_ann_cell_balance", "hinted-fact-broadcast:embeddings"),
    // C55 PQ: the O(PqK) codebook broadcast — fixed-size at any scale;
    // the ×k fanout collapses in a map-side struct-MIN before the shuffle
    ("q_embed_pq", "hinted-fact-broadcast:embeddings"),
    // C109 composes C55's assignment plan (plus its own 1-row total
    // broadcast), inheriting exactly that fixed-size codebook broadcast
    ("q_embed_pq_distortion", "hinted-fact-broadcast:embeddings"),
    // C112 composes the three bounded ANN searches (each with its vetted
    // probe-set broadcast) and caches their 50-row lists — the flag is
    // the searches' own, inherited
    ("q_ann_overlap", "hinted-fact-broadcast:embeddings"),
    // C111's recall ground truth: the broadcast side is the 1-in-N doc
    // SAMPLE's gram sets (bounded by the RecallDocMod deployment rule —
    // N scales with the corpus, the C35/C84 capacity rule), the one
    // deliberately non-blocked join in the dedup family; plus its 1-row
    // sample-count broadcast
    ("q_dedup_lsh_recall", "hinted-fact-broadcast:documents"),
    // C56 ADC: the probe LUT broadcasts — O(batch·PqSub·PqK), fixed-size
    // (probe batch + codebook caps), never a corpus fraction
    ("q_ann_pq_adc", "hinted-fact-broadcast:embeddings"),
    // C62 k-means: the seed set is the C13 selection rule capped at
    // KmClusters, and every refined-centroid broadcast sits above the
    // (cluster, dim)-keyed aggregate — both O(k·64) at any corpus size
    ("q_embed_kmeans", "hinted-fact-broadcast:embeddings"),
    // C70 composes C62's assignment, so it inherits exactly that vetted
    // O(k·64) centroid broadcast — same justification
    ("q_cluster_profile", "hinted-fact-broadcast:embeddings"),
    // C78 composes the same assignment (same O(k·64) broadcast); the
    // corpus-scaled doc-side join is shuffle_hash, never broadcast
    ("q_semantic_drift", "hinted-fact-broadcast:embeddings"),
    // C82 composes C35's semantic stage, inheriting its vetted O(IvfK)
    // centroid broadcast — same justification
    ("q_dedup_funnel", "hinted-fact-broadcast:embeddings"),
    // decontamination eval slice: doc_id % 100 == 7 — a fixed 1% eval set
    // whose gram explosion is eval-sized, never corpus-sized
    ("q_corpus_decontaminate", "hinted-fact-broadcast:documents"),
    // C87: the same benchmark-gram broadcast as C25 (bench-slice bounded);
    // the island windows partition by doc_id over HIT rows only —
    // per-partition work is one doc's gram-hit count (per-entity
    // sequential), and a deployment puts the C84 Bloom screen in front
    ("q_contamination_spans", "hinted-fact-broadcast:documents"),
    ("q_contamination_spans", "running-window-over-fact:documents"),
    // the test-scale declarative reference: its 100 TB path SHIPS as
    // q_corpus_pack_hier, row-for-row spec-pinned (the B21→B24 precedent)
    ("q_corpus_pack", "running-window-over-fact:documents"),
    // the hier path's WITHIN-CHUNK running sum: partition (source, chunk)
    // holds ≤ PackChunk rows BY CONSTRUCTION (chunk = doc_id div PackChunk);
    // the cross-chunk scan sits above an aggregate and is already exempt
    ("q_corpus_pack_hier", "running-window-over-fact:documents"),
    // C50 composes the hier packer, so it inherits exactly that vetted
    // chunk-bounded window — same justification
    ("q_pack_efficiency", "running-window-over-fact:documents"),
    // C107's gaps-and-islands windows PARTITION BY doc_id over the
    // non-keeper span occurrences of ONE doc (O(tokens/AnchorMod) worst
    // case, duplicate occurrences only in practice) — interval merging is
    // per-entity sequential by definition, same class as the sessionize
    // carry; the fact table under the window is the already-collapsed
    // C106 plan, not the corpus
    ("q_mask_coalesce", "running-window-over-fact:documents"),
    // C108 composes C107's per-doc core, inheriting exactly that vetted
    // doc-partitioned interval-merge window — same justification
    ("q_mask_datasheet", "running-window-over-fact:documents"),
    // per-user event-order carries are sequential BY DEFINITION (a session
    // id / latest-click can't be known out of order): partition = one
    // user's events, hot users bounded by the B41 bot screen upstream, and
    // the streaming twins (D2/D5) hold O(1)-per-user state instead
    ("q_events_sessionize", "running-window-over-fact:events"),
    ("q_events_asof", "running-window-over-fact:events")
  )

  /** Explicit broadcast hints whose subtree scans a fact table and carries
    * no Aggregate below the hint (an aggregate onto bounded keys is the
    * standard safe reduction; filter-bounded subtrees must be vetted). */
  private def hintHazards(lp: LogicalPlan): Seq[String] =
    lp.collect {
      case h: ResolvedHint if h.hints.strategy.contains(
        org.apache.spark.sql.catalyst.plans.logical.BROADCAST) => h
    }.flatMap { h =>
      val hasAgg = h.child.collectFirst { case a: Aggregate => a }.isDefined
      if (hasAgg) Seq.empty
      else h.child.collect { case r: LogicalRelation =>
        val path = r.relation match {
          case hfs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            hfs.location.rootPaths.headOption.map(_.getName).getOrElse("")
          case _ => ""
        }
        factTables.find(t => path.contains(t))
          .map(t => s"hinted-fact-broadcast:$t")
      }.flatten
    }

  /** First fact-table scan reachable below `p` without crossing an
    * aggregate (an aggregate onto bounded keys is the standard safe
    * reduction — a window above one sorts the reduced relation, not the
    * fact rows). Descends into cached subtrees. */
  private def factBelow(p: SparkPlan): Option[String] = p match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => None
    case f: org.apache.spark.sql.execution.FileSourceScanExec =>
      val path = f.relation.location.rootPaths.headOption
        .map(_.getName).getOrElse("")
      factTables.find(t => path.contains(t))
    case a: AdaptiveSparkPlanExec => factBelow(a.executedPlan)
    case m: InMemoryTableScanExec => factBelow(m.relation.cachedPlan)
    case other => other.children.flatMap(factBelow).headOption
  }

  /** True when the window computes a running aggregate: ordered, with an
    * agg expression framed from UnboundedPreceding but NOT the full
    * partition (a full-partition frame is a per-group aggregate, not a
    * sequential scan). Offset functions (lag/lead) and rank functions
    * (row_number — not an AggregateExpression) don't match. */
  private def runningAggFrame(w: WindowExec): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{
      SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding,
      WindowExpression, WindowSpecDefinition}
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    w.orderSpec.nonEmpty && w.windowExpression.exists { ne =>
      ne.collectFirst {
        case WindowExpression(_: AggregateExpression,
            WindowSpecDefinition(_, _,
              SpecifiedWindowFrame(_, UnboundedPreceding, upper)))
            if upper != UnboundedFollowing => ()
      }.isDefined
    }
  }

  private def windowHazards(p: SparkPlan): Seq[String] = {
    val here = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq("global-window")
      case w: WindowExec if runningAggFrame(w) =>
        factBelow(w.child).map(t => s"running-window-over-fact:$t").toSeq
      case _ => Seq.empty
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
      case other => other.children
    }
    here ++ kids.flatMap(windowHazards)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    var newFindings = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, dir).queryExecution
        val hazards =
          (hintHazards(qe.analyzed) ++ windowHazards(qe.executedPlan)).distinct
        hazards.foreach { h =>
          if (knownBounded.contains((name, h))) println(s"known   $name  $h")
          else { newFindings += 1; println(s"NEW     $name  $h") }
        }
      } catch { case e: Throwable =>
        println(s"ERROR   $name  ${e.getMessage.take(120)}")
      }
      spark.catalog.clearCache()
    }
    println(s"== audit done, $newFindings new finding(s) ==")
    spark.stop()
  }
}
