package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED sketch store — B51's "per-segment sketches persist once"
  * claim executed as an E-surface artifact ([[DedupArtifacts]]' pattern
  * applied to mergeable sketches).
  *
  * At 100 TB the sketch is the only thing a segment's ingest pass needs to
  * leave behind: an HLL register vector (m longs, MAX-mergeable) per month
  * and a CMS matrix (depth·width longs, CELL-SUM-mergeable) per event type
  * are written once, manifest-checksummed like every other artifact, and
  * any later union / overlap / frequency question is register arithmetic
  * over a handful of tiny rows — no fact re-scan, ever. Because both
  * merges are associative, commutative and partition-agnostic (max is
  * also idempotent; the CMS segments partition the stream, so cell sums
  * are exact), merging the persisted segments reproduces the single-pass
  * sketch BIT-FOR-BIT — the consumers here are byte-equality-pinned
  * against the inline B50/B51 plans in ArtifactSpec, through the parquet
  * round trip.
  *
  * Layout under a root (each directory carries the
  * `_graft_manifest.json` (n_rows, checksum) contract of
  * [[DedupArtifacts.readVerified]]):
  * {{{
  *   hll_month/      mth, regs          12 rows × m longs  (B51's segments)
  *   cms_type/       event_type, m, n   |types| × d·w      (B50's segments)
  *   qsketch_day/    day_epoch, regs, n  1/day × (64−s)·2^s  (B55's)
  * }}}
  *
  * The registered B50/B51 queries stay inline (they measure the one-pass
  * build); the store is the deployment path for REPEAT consumers, its
  * build-vs-read costs measured by ScaleProbe's `sketch_store_*` probes.
  */
object SketchArtifacts {

  /** Build the store: one narrow pass per sketch family. The HLL segments
    * come off the SAME (month, customer) relation the inline B51 uses
    * (HLL updates are idempotent, so sketch(distinct) ≡ sketch(stream));
    * the CMS segments partition B50's key stream by event type. */
  def write(spark: SparkSession, dir: String, root: String,
      m: Int = graft.functions.Kernels.HllM,
      depth: Int = Sketches.HhDepth, width: Int = Sketches.HhWidth): Unit = {
    graft.functions.Kernels.register(spark)
    DedupArtifacts.writeArtifact(
      Sketches.monthCustomers(spark, dir)
        .groupBy("mth")
        .agg(expr(s"graft_hll_sketch_m(o_custkey, $m)").as("regs")),
      s"$root/hll_month", "mth")
    DedupArtifacts.writeArtifact(
      graft.sources.Tables.events(spark, dir)
        .select(col("event_type"),
          floor(col("value")).cast("long").cast("string").as("key"))
        .groupBy("event_type")
        .agg(expr(s"graft_cms_sketch_g(key, $depth, $width)").as("m"),
          count(lit(1)).as("n")),
      s"$root/cms_type", "event_type")
    DedupArtifacts.writeArtifact(
      Sketches.dayValueSketches(spark, dir,
        graft.functions.Kernels.QSketchS),
      s"$root/qsketch_day", "day_epoch")
  }

  /** Manifest-verified per-day quantile-sketch bucket counts. */
  def qsketchDays(spark: SparkSession, root: String): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/qsketch_day")

  /** B55 answered FROM THE STORE: day-over-day value-quantile drift from
    * the persisted bucket-count rows alone — zero fact scans
    * (plan-pinned), byte-equal to the inline B55 (ArtifactSpec). */
  def valueQuantileDrift(spark: SparkSession, root: String): DataFrame = {
    graft.functions.Kernels.register(spark)
    Sketches.quantileDriftAssemble(qsketchDays(spark, root),
      graft.functions.Kernels.QSketchS)
  }

  /** Manifest-verified per-month HLL register vectors. */
  def hllMonths(spark: SparkSession, root: String): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/hll_month")

  /** Manifest-verified per-event-type CMS matrices. */
  def cmsTypes(spark: SparkSession, root: String): DataFrame =
    DedupArtifacts.readVerified(spark, s"$root/cms_type")

  /** B51 answered FROM THE STORE: the 66 venn cells come from the 12
    * persisted register vectors alone (max-merge via zip_with/greatest —
    * [[Sketches.overlapAssemble]], the assembly the inline plan runs on
    * its freshly-built sketches). The exact-intersection evaluation
    * column still reads orders once — it is the test-scale harness, not
    * part of the deployment answer; a deployment consumer reads ONLY the
    * 12 artifact rows. Byte-equal to the inline B51 (ArtifactSpec). */
  def monthOverlap(spark: SparkSession, dir: String, root: String,
      m: Int = graft.functions.Kernels.HllM): DataFrame = {
    graft.functions.Kernels.register(spark)
    Sketches.overlapAssemble(hllMonths(spark, root),
      Sketches.monthCustomers(spark, dir).cache(), m)
  }

  /** B51's deployment shape, estimates only: every column derives from
    * the persisted registers — zero fact-table scans (plan-pinned). */
  def monthOverlapEstimates(spark: SparkSession, root: String,
      m: Int = graft.functions.Kernels.HllM): DataFrame = {
    graft.functions.Kernels.register(spark)
    val sk = hllMonths(spark, root)
    val am2 = graft.functions.Kernels.hllAlphaM2Of(m)
    def estOf(regs: String) =
      expr(s"CAST('$am2' AS DOUBLE) / aggregate($regs, CAST(0 AS DOUBLE), " +
        "(acc, r) -> acc + pow(CAST(2 AS DOUBLE), -r))")
    sk.as("a").join(sk.as("b"), col("a.mth") < col("b.mth"))
      .select(col("a.mth").as("month_a"), col("b.mth").as("month_b"),
        estOf("a.regs").as("est_a"), estOf("b.regs").as("est_b"),
        expr("zip_with(a.regs, b.regs, (x, y) -> greatest(x, y))").as("u"))
      .withColumn("est_union", estOf("u"))
      .select(col("month_a"), col("month_b"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_inter"))
      .orderBy("month_a", "month_b")
  }

  /** B50 answered FROM THE STORE: the global sketch is the elementwise
    * CELL SUM of the persisted per-type matrices (the types partition the
    * stream, so every cell's sum is exactly the single-pass cell — CMS's
    * mergeability), then the identical screen + exact confirm
    * ([[Sketches.hhScreen]]). The event pass survives — it is the
    * screen's subject, not sketch rebuild. Byte-equal to the inline B50
    * (ArtifactSpec). */
  def heavyHitters(spark: SparkSession, dir: String, root: String,
      denom: Long = Sketches.HhSupportDenom,
      depth: Int = Sketches.HhDepth, width: Int = Sketches.HhWidth): DataFrame = {
    graft.functions.Kernels.register(spark)
    val cells = depth * width
    val sk = cmsTypes(spark, root)
      .agg(
        expr(s"aggregate(collect_list(m), " +
          s"array_repeat(CAST(0 AS BIGINT), $cells), " +
          "(acc, x) -> zip_with(acc, x, (a, b) -> a + b))").as("m"),
        sum("n").as("n"))
    Sketches.hhScreen(Sketches.hhKeys(spark, dir), sk, denom, depth, width)
  }
}
