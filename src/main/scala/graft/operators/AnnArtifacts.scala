package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED ANN index store — round 12's E-surface addition, closing
  * the one family that still rebuilt its index in-session per query: C74's
  * serve path recomputed per-vector norms, C13's cell assignment re-ran
  * the corpus × centroid argmax, and C56's codes re-ran the subspace
  * argmins, on EVERY search. At 100 TB an ANN index is built once by the
  * nightly indexing job (the reference's staging-table analog,
  * /root/reference/app/services/etl_service.py:252-293 — state written
  * once, read by every consumer) and every query run READS it; this
  * object writes the four index relations under the
  * `_graft_manifest.json` (n_rows, checksum, params) contract of
  * [[DedupArtifacts]], with the INDEX GEOMETRY as params so a reader
  * expecting a different quantizer/codebook fails fast instead of
  * silently scoring against the wrong index (the round-11 sketch-store
  * contract).
  *
  * Layout under a root:
  * {{{
  *   flat/           vec_id, label, embedding, n2     (serving snapshot)
  *   ivf_centroids/  cent_id, c_emb, c_n2             (coarse quantizer)
  *   ivf_cells/      vec_id, embedding, n2, cent_id   (cell-major corpus)
  *   pq_codebook/    cent_id, c_emb                   (PQ codewords)
  *   pq_codes/       vec_id, code_0..code_3           (compressed corpus)
  * }}}
  *
  * `flat` persists the PRECOMPUTED norms next to the vectors — the
  * store-fed searches scan zero `embeddings` parquet (plan-pinned in
  * ArtifactSpec): probes and corpus both come off the index, exactly a
  * serving node's working set. `ivf_cells` is the same corpus in
  * CELL-MAJOR layout (repartitioned on cent_id), the layout that lets a
  * deployment's probe read only its nprobe cells' files. The store-fed
  * searches are byte-equal to the inline builds (ArtifactSpec) because
  * the assemblies are the SAME frame-parametric plans
  * ([[EmbeddingOps.bruteforceHits]]/[[EmbeddingOps.ivfSearch]]/
  * [[EmbeddingOps.adcSearch]]) fed persisted relations.
  *
  * Build vs read is measured by ScaleProbe's `ann_index_build` (linear —
  * one assignment pass and one code pass over the corpus) and
  * `ann_index_route` (FLAT — a query router boots from the O(k) centroid
  * rows alone, never touching cells). */
object AnnArtifacts {

  import EmbeddingOps.{IvfK, IvfNprobe, PqK, PqSub, PqSubDim, ProbeBatch}

  private def flatParams = Map("family" -> "flat", "dim" -> "64")
  private def centParams(k: Int) =
    Map("family" -> "ivf_centroids", "k" -> k.toString)
  private def cellParams(k: Int) =
    Map("family" -> "ivf_cells", "k" -> k.toString)
  private def cbParams(pqK: Int) =
    Map("family" -> "pq_codebook", "k" -> pqK.toString,
      "sub" -> PqSub.toString, "sub_dim" -> PqSubDim.toString)
  private def codeParams(pqK: Int) =
    Map("family" -> "pq_codes", "k" -> pqK.toString,
      "sub" -> PqSub.toString, "sub_dim" -> PqSubDim.toString)

  /** The nightly index build: one norm pass (flat), one corpus × O(k)
    * assignment pass (cells), one corpus × O(pqK·sub) code pass (codes);
    * centroid/codebook relations are O(k). Each artifact manifest records
    * the geometry its rows are only meaningful under. */
  def write(spark: SparkSession, dir: String, root: String,
      k: Int = IvfK, pqK: Int = PqK): Unit = {
    val v = EmbeddingOps.vectors(spark, dir)
    DedupArtifacts.writeArtifact(v, s"$root/flat", "vec_id", flatParams)
    val cents = EmbeddingOps.ivfCentroids(v, k)
    DedupArtifacts.writeArtifact(cents, s"$root/ivf_centroids", "cent_id",
      centParams(k))
    DedupArtifacts.writeArtifact(
      EmbeddingOps.ivfAssigned(v, cents),
      s"$root/ivf_cells", "cent_id", cellParams(k))
    val cb = EmbeddingOps.ivfCentroids(v, pqK).select("cent_id", "c_emb")
    DedupArtifacts.writeArtifact(cb, s"$root/pq_codebook", "cent_id",
      cbParams(pqK))
    DedupArtifacts.writeArtifact(
      EmbeddingOps.pqCodesWide(v, cb),
      s"$root/pq_codes", "vec_id", codeParams(pqK))
  }

  // ---- manifest- and geometry-verified readers

  /** The serving snapshot (vec_id, label, embedding, n2). */
  def flat(spark: SparkSession, root: String): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/flat", flatParams)
      .select("vec_id", "label", "embedding", "n2")

  /** The coarse quantizer, built at `k`. */
  def centroids(spark: SparkSession, root: String,
      k: Int = IvfK): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/ivf_centroids", centParams(k))
      .select("cent_id", "c_emb", "c_n2")

  /** The cell-major corpus (vec_id, embedding, n2, cent_id), built at `k`. */
  def cells(spark: SparkSession, root: String, k: Int = IvfK): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/ivf_cells", cellParams(k))
      .select("vec_id", "embedding", "n2", "cent_id")

  /** The PQ codebook (cent_id, c_emb), built at `pqK`. */
  def pqCodebook(spark: SparkSession, root: String,
      pqK: Int = PqK): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/pq_codebook", cbParams(pqK))
      .select("cent_id", "c_emb")

  /** The compressed corpus (vec_id, code_0..code_3), built at `pqK`. */
  def pqCodes(spark: SparkSession, root: String, pqK: Int = PqK): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/pq_codes", codeParams(pqK))
      .select(col("vec_id") +:
        (0 until PqSub).map(s => col(s"code_$s")): _*)

  // ---- store-fed consumers (byte-equal to the inline builds, ArtifactSpec)

  /** C74 answered FROM THE STORE: probes and corpus both come off the
    * flat index (zero embeddings scans — plan-pinned); only the payload
    * fetch touches `documents`. */
  def annServe(spark: SparkSession, dir: String, root: String,
      probeBatch: Int = ProbeBatch, probeLo: Int = 0): DataFrame = {
    graft.functions.Kernels.register(spark)
    EmbeddingOps.serveJoin(spark, dir,
      EmbeddingOps.bruteforceHits(flat(spark, root), probeBatch, probeLo))
  }

  /** C13 answered FROM THE STORE: centroids and cell-major assignments
    * read persisted; probes off the flat index. */
  def annIvf(spark: SparkSession, root: String, k: Int = IvfK,
      probeBatch: Int = ProbeBatch, probeLo: Int = 0,
      nprobe: Int = IvfNprobe): DataFrame = {
    graft.functions.Kernels.register(spark)
    EmbeddingOps.ivfSearch(flat(spark, root), centroids(spark, root, k),
      cells(spark, root, k), probeBatch, probeLo, nprobe)
  }

  /** C56 answered FROM THE STORE: codes and codebook read persisted;
    * probes off the flat index. The search never recomputes a code. */
  def annPqAdc(spark: SparkSession, root: String, pqK: Int = PqK,
      probeBatch: Int = ProbeBatch, probeLo: Int = 0): DataFrame = {
    graft.functions.Kernels.register(spark)
    EmbeddingOps.adcSearch(flat(spark, root), pqCodes(spark, root, pqK),
      pqCodebook(spark, root, pqK), probeBatch, probeLo)
  }

  /** C117's report body over an ARBITRARY wide-code relation. */
  private[graft] def pqCodeUsageOf(codes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stacked = codes.select(explode(array(
        (0 until PqSub).map(s => struct(lit(s.toLong).as("sub_id"),
          col(s"code_$s").as("code"))): _*)).as("sc"))
      .select(col("sc.sub_id").as("sub_id"), col("sc.code").as("code"))
    // the share window runs ABOVE the (sub, code) aggregate — a ≤ sub·k
    // row grid, never the corpus
    stacked.groupBy("sub_id", "code").agg(count(lit(1)).as("n_vecs"))
      .withColumn("share", col("n_vecs").cast("double") /
        sum(col("n_vecs")).over(Window.partitionBy("sub_id")).cast("double"))
      .orderBy("sub_id", "code")
  }

  /** C117: `q_pq_code_usage` — codebook-utilization QA from the PERSISTED
    * codes alone (the index-health panel next to C53's cell balance):
    * per (subspace, codeword) how many vectors compressed onto it and
    * its in-subspace share. A subspace whose mass concentrates on a few
    * codewords has collapsed (quantization error explodes while C55's
    * MSE still averages fine over the corpus) — this is the report that
    * says RETRAIN THE CODEBOOK before recall degrades. Reads O(corpus)
    * 4-int rows, no embeddings, no distance folds. */
  def pqCodeUsage(spark: SparkSession, root: String,
      pqK: Int = PqK): DataFrame = {
    graft.functions.Kernels.register(spark)
    pqCodeUsageOf(pqCodes(spark, root, pqK))
  }

  /** The query router's bootstrap read — what a serving node does at
    * startup and per probe batch WITHOUT touching cells: read the O(k)
    * centroid rows (manifest-verified) and route each probe to its
    * `nprobe` nearest cells. ScaleProbe's `ann_index_route` pins this
    * FLAT in corpus size — the index-read payoff, measured. Probes need
    * (probe_id, embedding). */
  def routeProbes(spark: SparkSession, root: String, probes: DataFrame,
      k: Int = IvfK, nprobe: Int = IvfNprobe): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Kernels.register(spark)
    val cents = centroids(spark, root, k)
    probes.select(col("probe_id"), col("embedding").as("p_emb"),
        expr("graft_norm2(embedding)").as("p_n2"))
      .crossJoin(broadcast(cents))
      .select(col("probe_id"), col("cent_id"),
        (expr(EmbeddingOps.dotExpr("p_emb", "c_emb")) /
          (sqrt(col("p_n2")) * sqrt(col("c_n2")))).as("c_cos"))
      .withColumn("prnk", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("c_cos").desc, col("cent_id"))))
      .filter(col("prnk") <= nprobe)
      .select("probe_id", "prnk", "cent_id", "c_cos")
  }

  // ---- staged registered queries (the DedupArtifacts memoization: the
  // index is built ONCE per (source dir, JVM) and every consumer reads it,
  // exactly as the nightly indexing job feeds every search)

  private val annRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def annRoot(spark: SparkSession, dir: String): String =
    annRoots.computeIfAbsent(dir, { _ =>
      val root = DedupArtifacts.stagingRoot()
      write(spark, dir, root)
      root
    })

  /** The registered `q_ann_serve_store` (C115). Oracle unchanged from
    * C74 (DuckDB recomputes inline — hash equality across the store
    * round-trip is the correctness pin, the C75 precedent). */
  def annServeStaged(spark: SparkSession, dir: String): DataFrame =
    annServe(spark, dir, annRoot(spark, dir))

  /** The registered `q_ann_pq_adc_store` (C116). */
  def annPqAdcStaged(spark: SparkSession, dir: String): DataFrame =
    annPqAdc(spark, annRoot(spark, dir))

  /** The registered `q_pq_code_usage` (C117). */
  def pqCodeUsageStaged(spark: SparkSession, dir: String): DataFrame =
    pqCodeUsage(spark, annRoot(spark, dir))
}
