package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Pins for the persisted dedup-artifact layer (DedupArtifacts): the
  * staged production shape must be byte-equal to the inline declarative
  * compositions (the C28→C49 precedent), the staged report actions must
  * hold NO generator caches, and the manifest must catch file corruption. */
class ArtifactSpec extends SparkSpec {
  import operators.{DedupArtifacts, DedupOps}

  // one shared artifact build for the read-only pins (written once; the
  // write-path pins below stage their own roots)
  private lazy val root: String = {
    val r = tmpDir("graft-artifacts-")
    DedupArtifacts.write(spark, sf, r)
    r
  }

  test("artifact roundtrip: every artifact readVerified == its generator") {
    val gens: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "pairs_minhash_lsh" -> DedupOps.dedupMinhashLsh(spark, sf),
      "pairs_ngram_jaccard" -> DedupOps.dedupNgramJaccard(spark, sf),
      "pairs_simhash_band" -> DedupOps.dedupSimhashBand(spark, sf),
      "components" -> DedupOps.dedupComponents(spark, sf))
    for ((name, gen) <- gens) {
      val art = DedupArtifacts.readVerified(spark, s"$root/$name")
        .collect().map(_.toSeq).toSet
      val exp = gen.collect().map(_.toSeq).toSet
      assert(art == exp, s"$name artifact != generator output")
      spark.catalog.clearCache()
    }
  }

  test("write() leaves no cached relation behind (one-generator residency)") {
    root // force the shared build
    assert(spark.sharedState.cacheManager.isEmpty,
      "artifact build must reclaim every generator cache")
  }

  test("artifact-fed reports are byte-equal to the inline plans") {
    val pins = Seq(
      ("agreement", DedupArtifacts.agreement(spark, root),
        DedupOps.dedupAgreement(spark, sf)),
      ("clusterSizes", DedupArtifacts.clusterSizes(spark, root),
        DedupOps.dedupClusterSizes(spark, sf)),
      ("canonical", DedupArtifacts.canonical(spark, sf, root),
        DedupOps.dedupCanonical(spark, sf)),
      ("funnel", DedupArtifacts.funnel(spark, sf, root),
        DedupOps.dedupFunnel(spark, sf)))
    for ((name, art, inline) <- pins) {
      // both sides end in the same orderBy — compare row-for-row, in order
      assert(art.collect().toSeq == inline.collect().toSeq,
        s"artifact-fed $name diverges from the inline plan")
      spark.catalog.clearCache()
    }
  }

  test("staged agreement action reads only artifacts: zero cached scans") {
    val staged = DedupArtifacts.agreementStaged(spark, sf)
    val stagedCaches = staged.queryExecution.optimizedPlan
      .collect { case r: InMemoryRelation => r }
    assert(stagedCaches.isEmpty,
      "the staged matrix action must not hold any generator cache")
    spark.catalog.clearCache()
    // the inline twin's single action holds all three generators' caches —
    // the round-6 residency finding this layer closes
    val inline = DedupOps.dedupAgreement(spark, sf)
    val inlineCaches = inline.queryExecution.optimizedPlan
      .collect { case r: InMemoryRelation => r.cacheBuilder }.distinct
    assert(inlineCaches.size >= 3,
      s"inline agreement should hold 3 generator caches, saw ${inlineCaches.size}")
    spark.catalog.clearCache()
  }

  test("staged funnel action drops the component cache") {
    val staged = DedupArtifacts.funnelStaged(spark, sf)
    val stagedCaches = staged.queryExecution.optimizedPlan
      .collect { case r: InMemoryRelation => r }
    assert(stagedCaches.isEmpty,
      "the staged funnel action must read components from parquet")
    spark.catalog.clearCache()
    val inline = DedupOps.dedupFunnel(spark, sf)
    val inlineCaches = inline.queryExecution.optimizedPlan
      .collect { case r: InMemoryRelation => r.cacheBuilder }.distinct
    assert(inlineCaches.size >= 1,
      "inline funnel holds the component cache")
    spark.catalog.clearCache()
  }

  test("manifest verification fails fast on a corrupted artifact") {
    val r2 = tmpDir("graft-artifacts-corrupt-")
    DedupArtifacts.writeComponents(spark, sf, r2)
    // drop one part file: row count and checksum both diverge
    val dir = new java.io.File(s"$r2/components")
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(part.delete())
    val e = intercept[RuntimeException] {
      DedupArtifacts.readVerified(spark, s"$r2/components").count()
    }
    assert(e.getMessage.contains("failed verification"))
    spark.catalog.clearCache(): Unit
  }

  test("same-source agreement (C75b) equals inline twin, shrinks only mh/sb") {
    val staged = DedupArtifacts.agreementSameSourceStaged(spark, sf)
    // staged ≡ inline (the C28→C49 byte-equality precedent)
    val inline = DedupOps.dedupAgreementSameSource(spark, sf)
    assert(staged.except(inline).count() == 0 &&
      inline.except(staged).count() == 0,
      "staged same-source matrix diverges from the inline plan")
    spark.catalog.clearCache()
    val prod = DedupArtifacts.agreementStaged(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val same = DedupArtifacts.agreementSameSourceStaged(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(same.keySet == prod.keySet)
    same.foreach { case (k, s) =>
      val p = prod(k)
      // restricting the domain can only DROP pairs ...
      assert(s.getLong(2) <= p.getLong(2) && s.getLong(3) <= p.getLong(3))
      // ... and C4's counts are untouched (same-source by construction)
      def njCount(key: (String, String), r: org.apache.spark.sql.Row): Seq[Long] =
        Seq(if (key._1 == "ngram_jaccard") Some(r.getLong(2)) else None,
          if (key._2 == "ngram_jaccard") Some(r.getLong(3)) else None).flatten
      assert(njCount(k, s) == njCount(k, p))
    }
    spark.catalog.clearCache(): Unit
  }

  test("staged queries survive an empty corpus (fixed 3-row matrix)") {
    val empty = tmpDir("graft-empty-corpus-")
    val schema = sources.Tables.documents(spark, sf).schema
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$empty/documents.parquet")
    assert(DedupArtifacts.agreementStaged(spark, empty).count() == 3)
    spark.catalog.clearCache(): Unit
  }
}
