package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Consumer facade — the adoption surface (round 16, the round-15
  * verdict's item 7). `SparkEntry.queries` is a driver contract: 204 map
  * entries keyed by gate names, organized for the correctness harness,
  * not for a user. These two objects are the same library organized for
  * a CONSUMER: task-named entry points per family, each delegating to
  * the one operator object that owns the semantics (no logic lives here
  * — scale notes, exactness devices and plan pins stay with the
  * delegates and their specs). README.md §Quickstart walks the
  * read → curate → dedup → split/mix → pack → store path against these
  * names.
  *
  * Naming: the reporting twin is `Reports`, not `Analytics`, so the
  * facade never shadows [[graft.operators.Analytics]] under the
  * `graft.operators._` wildcard the codebase imports everywhere.
  *
  * Everything here keeps the library's dataset convention: `dir` is a
  * table root holding the parquet tables (`documents`, `embeddings`,
  * `orders`, …) the way `/root/testdata/sf*` lays them out; methods
  * taking DataFrames say so explicitly. For the full 204-query surface
  * (sweeps, audits, diagnostics) use [[Corpus.run]]/[[Reports.run]] with
  * a gate name from [[Corpus.names]]. */
object Corpus {

  // ---- read -------------------------------------------------------------
  /** The raw document corpus (doc_id, text, source, lang, …). */
  def documents(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** The embedding table (vec_id, label, embedding: array&lt;float&gt;). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)

  // ---- curate -----------------------------------------------------------
  /** The composed admission pipeline: non-empty → quality gate → langid
    * agreement → exact-dedup keeper → PII scrub, as ONE narrow projection
    * + ONE hash shuffle (C17). */
  def curate(spark: SparkSession, dir: String,
      minQuality: Double = 0.0): DataFrame =
    Pipeline.corpusPipeline(spark, dir, minQuality)

  /** Stage-by-stage admission accounting for [[curate]] (C81): rows in,
    * rows surviving, per-gate kill counts. */
  def admissionReport(spark: SparkSession, dir: String): DataFrame =
    Pipeline.admissionReport(spark, dir)

  /** Per-document quality signals (C9: length/punct/stopword ratios). */
  def qualitySignals(spark: SparkSession, dir: String): DataFrame =
    TextOps.qualityScore(spark, dir)

  /** N-gram-heuristic language id per document (C8). */
  def languageId(spark: SparkSession, dir: String): DataFrame =
    TextOps.langId(spark, dir)

  // ---- dedup ------------------------------------------------------------
  /** Exact duplicate families: one 16-byte content-hash shuffle, min-id
    * keeper (C1). */
  def exactDuplicates(spark: SparkSession, dir: String): DataFrame =
    DedupOps.dedupExact(spark, dir)

  /** Near-duplicate pairs via MinHash-LSH band buckets (C2) — bucketed,
    * never all-pairs. */
  def nearDuplicates(spark: SparkSession, dir: String): DataFrame =
    DedupOps.dedupMinhashLsh(spark, dir)

  /** Duplicate clusters: connected components over the pair graph,
    * O(log diameter) rounds (C18). */
  def duplicateClusters(spark: SparkSession, dir: String): DataFrame =
    DedupOps.dedupComponents(spark, dir)

  /** Bytes/docs reclaimed if each cluster keeps one representative
    * (C38). */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame =
    DedupOps.dedupSavings(spark, dir)

  // ---- split / decontaminate / mix --------------------------------------
  /** Deterministic content-keyed train/val/test split — byte-identical
    * duplicates can never straddle splits (C19). */
  def split(spark: SparkSession, dir: String): DataFrame =
    Pipeline.corpusSplit(spark, dir)

  /** Benchmark n-gram decontamination with the Bloom-gated scan path
    * (C25). */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    Pipeline.corpusDecontaminate(spark, dir)

  /** Weighted source mixture with deterministic per-doc admission
    * (C27). */
  def mix(spark: SparkSession, dir: String): DataFrame =
    Pipeline.corpusMix(spark, dir)

  // ---- pack / shard ------------------------------------------------------
  /** Greedy sequence packing into fixed token budgets (C28). */
  def pack(spark: SparkSession, dir: String): DataFrame =
    Pipeline.corpusPack(spark, dir)

  /** The 100 TB packing path: hierarchical two-pass prefix-sum bin
    * assignment (C49). */
  def packHier(spark: SparkSession, dir: String): DataFrame =
    Pipeline.corpusPackHier(spark, dir)

  /** Deterministic fixed-count sharding manifest for export (C65). */
  def shard(spark: SparkSession, dir: String): DataFrame =
    Pipeline.corpusShard(spark, dir)

  // ---- search -----------------------------------------------------------
  /** IVF ANN search over the embedding column: broadcast coarse
    * centroids, nprobe cells per probe (C13). */
  def annSearch(spark: SparkSession, dir: String): DataFrame =
    EmbeddingOps.annIvf(spark, dir)

  /** Serving-shaped ANN: standing index + probe batch (C74); the
    * persisted-store twin is `run("q_ann_serve_store")`. */
  def annServe(spark: SparkSession, dir: String): DataFrame =
    EmbeddingOps.annServe(spark, dir)

  // ---- store ------------------------------------------------------------
  /** Build the persisted standing indexes under `root`: dedup
    * hash/signature/gram/span families ([[operators.StreamArtifacts]])
    * and the ANN index ([[operators.AnnArtifacts]]). Maintain them
    * nightly with [[nightly]]. */
  def buildStores(spark: SparkSession, dir: String, root: String): Unit = {
    StreamArtifacts.write(spark, dir, s"$root/stream")
    AnnArtifacts.write(spark, dir, s"$root/ann")
  }

  /** One composed nightly maintenance run over the persisted stores —
    * recovery prologue, day appends, cadence-gated compaction, verified
    * re-stamp ([[operators.Nightly.runDay]]); returns the step report. */
  def nightly(spark: SparkSession, dayEpoch: Long, sketchRoot: String,
      streamRoot: String, annRoot: String, dayEvents: DataFrame,
      dayDocs: DataFrame, dayVectors: DataFrame): DataFrame =
    Nightly.runDay(spark, dayEpoch, sketchRoot, streamRoot, annRoot,
      dayEvents, dayDocs, dayVectors)

  // ---- the full surface --------------------------------------------------
  /** Every registered query name (the SURVEY §2 inventory). */
  def names: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Run any registered query by gate name — the escape hatch to the
    * full 204-query surface. */
  def run(name: String)(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  /** Per-source corpus datasheet (C31) and health gate (C47). */
  def datasheet(spark: SparkSession, dir: String): DataFrame =
    Pipeline.corpusDatasheet(spark, dir)
  def sourceHealth(spark: SparkSession, dir: String): DataFrame =
    Pipeline.sourceHealth(spark, dir)
}

/** Star-schema reporting, organized for a consumer — the flagship shapes
  * a warehouse runs daily. Same conventions as [[Corpus]]; the full
  * B-series (sketches, funnels, cohorts, …) is reachable via
  * [[Reports.run]]. */
object Reports {

  /** TPC-H Q1-flavor pricing summary (B1). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Analytics.pricingSummary(spark, dir)

  /** Monthly sales roll-up (B4). */
  def salesByMonth(spark: SparkSession, dir: String): DataFrame =
    Analytics.salesByMonth(spark, dir)

  /** Per-customer lifetime stats (B6). */
  def customerStats(spark: SparkSession, dir: String): DataFrame =
    Analytics.customerStats(spark, dir)

  /** RFM segmentation (B18). */
  def customerRfm(spark: SparkSession, dir: String): DataFrame =
    Cubes.customerRfm(spark, dir)

  /** Open-order aging buckets (B29). */
  def ordersBacklog(spark: SparkSession, dir: String): DataFrame =
    Analytics.ordersBacklog(spark, dir)

  /** Customer order-count distribution, zero bucket included (B66,
    * Q13-flavor). */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame =
    Analytics.customerOrderDistribution(spark, dir)

  /** Top supplier(s) by quarterly revenue, ties included (B67,
    * Q15-flavor). */
  def topSupplierRevenue(spark: SparkSession, dir: String): DataFrame =
    Analytics.topSupplierRevenue(spark, dir)

  /** Run any registered query by gate name. */
  def run(name: String)(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)
}
