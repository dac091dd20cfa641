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
  * Layout under a root (per-vector relations hive-partitioned by
  * `ingest_day` since round 13 — 0 is the initial build, day N's admitted
  * vectors land as their own slice; quantizer relations are the frozen
  * model and stay single artifacts):
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
  * Build vs read vs maintenance is measured by ScaleProbe:
  * `ann_index_build` (linear — one assignment pass and one code pass over
  * the corpus), `ann_index_route` (FLAT — a query router boots from the
  * O(k) centroid rows alone, never touching cells), `ann_index_search`
  * (linear at fixed k), `ann_index_append_slice` (FLAT — a fixed
  * constructed day assigned via the frozen quantizer, re-stamp deferred)
  * and `ann_index_append_fixedday` (slice + canonical re-stamp, ≤ linear);
  * gates recorded in SCALING_r13.md. */
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

  /** The three PER-VECTOR relations are LOG-STRUCTURED since round 13
    * (the StreamArtifacts day-slice device applied to the vector index):
    * hive-partitioned by `ingest_day` (0 = the initial build; day N's
    * admitted vectors land as their own slice via
    * [[graft.operators.Etl.replaceSlice]]). Their canonical view is the
    * raw union — vec ids are disjoint across ingest days (the appendDay
    * contract), so no read-side merge is needed and slices simply add. */
  private val VectorFamilies = Seq("flat", "ivf_cells", "pq_codes")

  private def vectorFamilyParams(family: String, k: Int,
      pqK: Int): Map[String, String] = family match {
    case "flat"      => flatParams
    case "ivf_cells" => cellParams(k)
    case "pq_codes"  => codeParams(pqK)
  }

  /** Per-vector slice frames for a vector set under a FROZEN quantizer:
    * norms (flat), nearest-centroid assignment (cells), subspace argmin
    * codes (codes) — each an O(vectors) pass, never O(corpus). The slice
    * key keeps cells CELL-MAJOR inside each ingest-day directory. */
  private def sliceFrames(v: DataFrame, cents: DataFrame,
      cb: DataFrame): Seq[(String, DataFrame, String)] = Seq(
    ("flat", v, "vec_id"),
    ("ivf_cells", EmbeddingOps.ivfAssigned(v, cents), "cent_id"),
    ("pq_codes", EmbeddingOps.pqCodesWide(v, cb), "vec_id"))

  /** Build the store from an explicit vector frame and a FROZEN quantizer
    * (centroids + PQ codebook) — the frame-parametric body [[write]] and
    * the append≡rebuild spec share: quantizer relations persist as plain
    * artifacts (they are the frozen model — appends never touch them);
    * the per-vector relations land as the `ingest_day=0` slice under the
    * canonical-digest manifest. */
  private[graft] def writeFrom(spark: SparkSession, v: DataFrame,
      cents: DataFrame, cb: DataFrame, root: String,
      k: Int = IvfK, pqK: Int = PqK): Unit = {
    DedupArtifacts.writeArtifact(cents, s"$root/ivf_centroids", "cent_id",
      centParams(k))
    DedupArtifacts.writeArtifact(cb, s"$root/pq_codebook", "cent_id",
      cbParams(pqK))
    val par = spark.sessionState.conf.numShufflePartitions
    sliceFrames(v, cents, cb).foreach { case (f, rows, key) =>
      rows.withColumn("ingest_day", lit(0L))
        .repartition(par, col(key))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("ingest_day").parquet(s"$root/$f")
      DedupArtifacts.refreshManifestCanonical(spark, s"$root/$f",
        vectorFamilyParams(f, k, pqK), "ingest_day", identity)
      spark.catalog.clearCache()
    }
  }

  /** The nightly index build: one norm pass (flat), one corpus × O(k)
    * assignment pass (cells), one corpus × O(pqK·sub) code pass (codes);
    * centroid/codebook relations are O(k). Each artifact manifest records
    * the geometry its rows are only meaningful under. */
  def write(spark: SparkSession, dir: String, root: String,
      k: Int = IvfK, pqK: Int = PqK): Unit = {
    val v = EmbeddingOps.vectors(spark, dir)
    writeFrom(spark, v, EmbeddingOps.ivfCentroids(v, k),
      EmbeddingOps.ivfCentroids(v, pqK).select("cent_id", "c_emb"),
      root, k, pqK)
  }

  /** INCREMENTAL MAINTENANCE (round 13 — the verdict's remaining store
    * gap): day `dayEpoch`'s admitted vectors (vec_id, label, embedding)
    * append to the three per-vector relations, assigned via the
    * PERSISTED FROZEN quantizer — an O(day) norm/assign/code pass plus
    * one slice swap per family; the standing corpus is never re-read and
    * the quantizer is never retrained (C117's code-usage panel is the
    * report that says when it must be). CONTRACT: an admitted vector is
    * a NEW vector — its id must not already exist in the store (slices
    * add; a restated day replaces its own slice, run-twice ≡ run-once).
    * Geometry is verified against every family manifest BEFORE any slice
    * lands. `restamp = false` defers the canonical re-stamp (the
    * sketch-store batch device); until the re-stamp, verified readers
    * fail fast — never a silent misread. Append-built ≡ a one-pass
    * rebuild over the union under the SAME frozen quantizer, pinned by
    * manifest equality (ArtifactSpec). */
  def appendDay(spark: SparkSession, root: String, dayEpoch: Long,
      dayVectors: DataFrame, k: Int = IvfK, pqK: Int = PqK,
      restamp: Boolean = true): Unit = {
    (Seq("ivf_centroids" -> centParams(k), "pq_codebook" -> cbParams(pqK)) ++
      VectorFamilies.map(f => f -> vectorFamilyParams(f, k, pqK)))
      .foreach { case (f, want) =>
        // a MISSING manifest fails too (round 14, the advisor's finding):
        // an absent manifest is a half-built store or a crashed
        // compaction's un-restamped publish — silently skipping the check
        // would let a wrong-geometry day land; the recovery for the
        // crashed-compaction state is compact()/restamp(), not an append
        val rec = DedupArtifacts.manifestParams(spark, s"$root/$f")
          .getOrElse(sys.error(s"ANN index $root/$f has no manifest — " +
            "store half-built or a compaction crashed before its " +
            "re-stamp; run recover() before appending"))
        if (rec != want)
          sys.error(s"ANN index $root/$f geometry mismatch: append " +
            s"expects $want, store records $rec")
      }
    graft.functions.Kernels.register(spark)
    val cents = centroids(spark, root, k)
    val cb = pqCodebook(spark, root, pqK)
    val v = dayVectors.select(col("vec_id"), col("label"), col("embedding"),
      expr("graft_norm2(embedding)").as("n2"))
    sliceFrames(v, cents, cb).foreach { case (f, rows, _) =>
      Etl.replaceSlice(spark, s"$root/$f", "ingest_day",
        dayEpoch.toString, rows)
    }
    if (restamp) this.restamp(spark, root, k, pqK)
  }

  /** The deferred canonical re-stamp for the three per-vector families —
    * one narrow O(index) digest pass each (index bytes, never
    * embeddings). */
  def restamp(spark: SparkSession, root: String, k: Int = IvfK,
      pqK: Int = PqK): Unit =
    VectorFamilies.foreach { f =>
      DedupArtifacts.refreshManifestCanonical(spark, s"$root/$f",
        vectorFamilyParams(f, k, pqK), "ingest_day", identity)
    }

  /** SLICE COMPACTION for the per-vector relations (the
    * [[DedupArtifacts.compactSlices]] device — vec ids are disjoint
    * across days, so the canonical merge is the raw union): merge every
    * slice ≤ `upToDay` into one, preserving the CELL-MAJOR layout inside
    * the merged `ivf_cells` slice (rows co-partitioned on cent_id — the
    * layout that lets a probe read only its nprobe cells' files) and the
    * vec-keyed layout for flat/codes. The canonical digest — and with it
    * the manifest — is invariant (spec-pinned), so the manifest TRAVELS
    * WITH the swap (round 15: compactSlices copies it into the staged
    * layout — no post-publish re-stamp, no missing-manifest crash
    * window, and a canon-breaking compaction would fail the next
    * verified read instead of being re-stamped over); quantizer
    * relations are single artifacts and never compact. Crashed runs are
    * repaired by re-running compact() (stranded publishes restored on
    * entry); must be serialized with appendDay — [[Nightly.runDay]] is
    * the sequenced cadence. */
  def compact(spark: SparkSession, root: String, upToDay: Long): Unit =
    VectorFamilies.foreach { f =>
      val key = if (f == "ivf_cells") "cent_id" else "vec_id"
      if (DedupArtifacts.compactSlices(spark, s"$root/$f", "ingest_day",
          upToDay, identity, Some(key)))
        spark.catalog.clearCache()
    }

  /** The [[StreamArtifacts.recover]] prologue for the per-vector
    * relations: restore mid-publish strandings so a replayed
    * maintenance run starts consistent. A MISSING manifest FAILS
    * (round 15): the manifest travels with compaction's publish, so
    * absence means a half-built store that a caller-params re-stamp
    * would wrongly bless — the repair is a rebuild. FS checks only, no
    * Spark job. Quantizer relations never publish-swap (plain
    * writeArtifact stamps inline), so they need no recovery path. */
  def recover(spark: SparkSession, root: String): Boolean =
    VectorFamilies.map { f =>
      val restored = DedupArtifacts.restoreStranded(spark, s"$root/$f")
      if (DedupArtifacts.manifestMissing(spark, s"$root/$f"))
        sys.error(s"ANN index $root/$f has no manifest — store " +
          "half-built (a crashed compaction cannot leave this state: " +
          "the manifest travels with its publish); rebuild the family, " +
          "or — for a pre-manifest-travel store whose manifest was lost " +
          "to the old publish-then-re-stamp crash window — run the " +
          "one-shot restampMissingManifests migration")
      restored
    }.exists(identity)

  /** ONE-SHOT MIGRATION for stores left by the PRE-round-15 release's
    * compaction crash window (publish succeeded, re-stamp lost) — the
    * [[StreamArtifacts.restampMissingManifests]] twin for the per-vector
    * families: re-stamps exactly the families whose manifest is missing
    * (stranded publishes restored first) with the caller's params — the
    * explicit operator assertion [[recover]] deliberately refuses to
    * make implicitly. Returns the re-stamped family names. */
  def restampMissingManifests(spark: SparkSession, root: String,
      k: Int = IvfK, pqK: Int = PqK): Seq[String] =
    VectorFamilies.filter { f =>
      DedupArtifacts.restoreStranded(spark, s"$root/$f"): Unit
      val missing = DedupArtifacts.manifestMissing(spark, s"$root/$f")
      if (missing)
        DedupArtifacts.refreshManifestCanonical(spark, s"$root/$f",
          vectorFamilyParams(f, k, pqK), "ingest_day", identity)
      missing
    }

  /** The cadence policy for the per-vector relations — the
    * [[StreamArtifacts.compactIfNeeded]] device: an FS listing decides
    * (no Spark job below the threshold), only slices strictly below the
    * `protectFrom` replay horizon merge (a replayed appendDay REPLACES
    * its slice — merging the log into a replayable day's label would
    * let the replay overwrite history; see the StreamArtifacts scaladoc),
    * and under a steady daily feed the slice count stays bounded at
    * `maxSlices + 1` forever. The D40 maintainer invokes this from its
    * foreachBatch epilogue with its batch's min day — the single-writer
    * cadence that already serializes appends, so the compactSlices
    * concurrency contract holds by construction. */
  def compactIfNeeded(spark: SparkSession, root: String,
      maxSlices: Int = StreamArtifacts.DefaultMaxSlices,
      protectFrom: Long = Long.MaxValue): Boolean = {
    val days = VectorFamilies.map(f =>
      DedupArtifacts.sliceDays(spark, s"$root/$f", "ingest_day"))
    val mergeable = days.flatten.distinct.filter(_ < protectFrom)
    if (days.map(_.length).max <= maxSlices || mergeable.size <= 1) false
    else { compact(spark, root, mergeable.max); true }
  }

  // ---- manifest- and geometry-verified readers

  /** The serving snapshot (vec_id, label, embedding, n2) — the union of
    * all ingest-day slices, canonical-digest-verified. */
  def flat(spark: SparkSession, root: String): DataFrame =
    DedupArtifacts.readVerifiedCanonical(spark, s"$root/flat", flatParams,
        "ingest_day", identity)
      .select("vec_id", "label", "embedding", "n2")

  /** The coarse quantizer, built at `k`. */
  def centroids(spark: SparkSession, root: String,
      k: Int = IvfK): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/ivf_centroids", centParams(k))
      .select("cent_id", "c_emb", "c_n2")

  /** The cell-major corpus (vec_id, embedding, n2, cent_id), built at `k`. */
  def cells(spark: SparkSession, root: String, k: Int = IvfK): DataFrame =
    DedupArtifacts.readVerifiedCanonical(spark, s"$root/ivf_cells",
        cellParams(k), "ingest_day", identity)
      .select("vec_id", "embedding", "n2", "cent_id")

  /** The PQ codebook (cent_id, c_emb), built at `pqK`. */
  def pqCodebook(spark: SparkSession, root: String,
      pqK: Int = PqK): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/pq_codebook", cbParams(pqK))
      .select("cent_id", "c_emb")

  /** The compressed corpus (vec_id, code_0..code_3), built at `pqK`. */
  def pqCodes(spark: SparkSession, root: String, pqK: Int = PqK): DataFrame =
    DedupArtifacts.readVerifiedCanonical(spark, s"$root/pq_codes",
        codeParams(pqK), "ingest_day", identity)
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

  /** Force the per-(dir, JVM) store staging now — the [[graft.Bench]]
    * measured-staging-phase hook (see [[DedupArtifacts.stage]]). */
  private[graft] def stage(spark: SparkSession, dir: String): Unit =
    annRoot(spark, dir): Unit

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
