package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting helpers must be pure rewrites: same results as the direct
  * join/agg, with the key spread over `factor` sub-keys in between. */
class SkewSpec extends SparkSpec {

  test("saltedJoin matches the plain join result") {
    val sp = spark
    import sp.implicits._
    // one hot key (k=1) plus a long tail
    val large = ((1 to 500).map(i => (1L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong + 1, i.toLong))).toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "label")

    val plain = large.join(small, "k")
    val salted = Skew.saltedJoin(large, small, "k", col("row_id"), factor = 8)

    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedAgg matches the plain aggregation") {
    val sp = spark
    import sp.implicits._
    val df = ((1 to 1000).map(i => (1L, i.toLong)) ++
      (1 to 30).map(i => (2L, i.toLong))).toDF("k", "v")

    val plain = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"), max("v").as("max_v"))
    val salted = Skew.saltedAgg(df, "k", col("v"), factor = 8,
      partials = Seq(sum("v").as("sum_v"), count(lit(1)).as("n"), max("v").as("max_v")),
      merge = Seq(sum("sum_v").as("sum_v"), sum("n").as("n"), max("max_v").as("max_v")))

    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin actually spreads a hot key over multiple salts") {
    val sp = spark
    import sp.implicits._
    val large = (1 to 500).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val nSalts = large
      .withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(nSalts > 1, "entropy column failed to spread the hot key")
  }

  test("dedup bucket cap is non-binding on the test corpus (C2 + C14)") {
    // the MaxBucketDocs prune must not change oracle results at test SFs:
    // assert the largest real bucket sits well under the cap, so the hot
    // set is empty and the anti-join is an identity (measured maxes: 132
    // C2 / 343 C14 at sf0.01, 1381 / 3253 at sf0.1)
    import graft.operators.DedupOps
    val sp = spark
    graft.functions.Kernels.register(sp)
    val sigMax = graft.sources.Tables.documents(sp, sf)
      .withColumn("norm", lower(trim(col("text"))))
      .filter(length(col("norm")) >= 5)
      .select(posexplode(expr("graft_minhash_sigs(norm)")).as(Seq("band", "sig")))
      .groupBy("band", "sig").count()
      .agg(max("count")).head.getLong(0)
    val bandMax = graft.sources.Tables.documents(sp, sf)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .select(expr("graft_simhash32(toks)").as("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("band"), expr("shiftright(simhash, band * 8) % 256").as("bv"))
      .groupBy("band", "bv").count()
      .agg(max("count")).head.getLong(0)
    assert(sigMax < DedupOps.MaxBucketDocs, s"C2 max bucket $sigMax")
    assert(bandMax < DedupOps.MaxBucketDocs, s"C14 max bucket $bandMax")
  }

  test("salted self-join spreads a synthetic hot bucket and keeps the pair set") {
    // the deterministic fallback for a hot-but-legitimate (band, sig)
    // bucket: salt one side, replicate the other — the pair set must be
    // EXACTLY the direct self-join's, while the bucket's rows land in
    // multiple shuffle partitions instead of one
    val sp = spark
    import sp.implicits._
    val bucket = (1L to 200L).map(i => ("b0", i)).toDF("bkt", "doc_id")
    val direct = bucket.as("a").join(bucket.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val salted = Skew.saltedJoin(
        bucket.toDF("bkt", "doc_id"),
        bucket.select(col("bkt"), col("doc_id").as("doc_b2")),
        "bkt", col("doc_id"), factor = 8)
      .filter(col("doc_id") < col("doc_b2"))
      .select(col("doc_id").as("doc_a"), col("doc_b2").as("doc_b"))
    assert(direct.count() == 200L * 199L / 2)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // the spread is real: under hash partitioning on (bkt, _salt) the
    // single hot bucket key maps to >1 shuffle partition. Computed with
    // the partitioner's own arithmetic (pmod(murmur3, n)) — observing
    // spark_partition_id after a repartition would be defeated here by
    // AQE coalescing this tiny test shuffle back into one partition
    val n = sp.sessionState.conf.numShufflePartitions
    val pids = bucket
      .withColumn("_salt", pmod(hash(col("doc_id")), lit(8)))
      .select(pmod(hash(col("bkt"), col("_salt")), lit(n)).as("pid"))
      .distinct().count()
    assert(pids > 1, s"hot bucket stayed on $pids partition(s)")
  }
}
