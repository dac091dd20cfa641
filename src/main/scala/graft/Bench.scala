package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * sys.env("SPARK_GRAFT_SF_DIR") and prints one JSON line with per-query
  * wall seconds. Results are materialized through the noop sink so Catalyst
  * cannot prune work the query declares (a bare count() would let column
  * pruning drop aggregate expressions).
  *
  * Robustness (round 6): the full-run numbers used to carry up to 8×
  * contention noise — back-to-back min-of-2 samples share any transient
  * spike (GC, shuffle-file churn from the previous query), so a single
  * spike faked large regressions (q_validate_products 7.44s in the run,
  * 0.93s warm). Now: one UNTIMED warmup pass over every query absorbs
  * per-query codegen/JIT, then timed passes separated by the length of
  * a full pass — a spike has to recur minutes apart on the same query to
  * survive the min. Every timed sample starts cache-cold (clearCache after
  * each execution — operators cache() intermediates they cannot unpersist
  * themselves), matching how a query runs in isolation; before this,
  * leaked caches measured 4-6× slowdowns on later-alphabet queries.
  *
  * Round 7, after diagnosing the residual 6-query "unstable" set: both
  * flagged clusters sat immediately AFTER the heaviest work — q1/q3 open
  * the timed pass right after the 136-query warmup pass, and the
  * q_dedup_{incremental,minhash_est,minhash_lsh,ngram_jaccard} run is the
  * alphabetical wake of the two most expensive queries (agreement, funnel,
  * both of which stage artifacts and drop corpus-scaled caches). The noise
  * is DEFERRED CLEANUP: unpersist/broadcast-removal is asynchronous
  * (ContextCleaner drains a GC-fed reference queue), so the previous
  * query's teardown lands on the next query's clock. Three changes: (1)
  * cache-clear moved OUT of the timed window, (2) a short between-queries
  * drain pause pays the cleanup debt off the clock, (3) THREE timed
  * passes with the min reported and "unstable" flagged on median > 3×
  * min — one spike in three samples no longer flags, genuine bimodality
  * still does. Measured A/B at sf0.1: unstable [] on consecutive full
  * runs and total 148 s → 122 s. A forced System.gc() per query was ALSO
  * tried and is deliberately absent: 408 full GCs evict JIT'd/generated
  * code, which penalizes exactly the composed queries with the largest
  * codegen surface (q_modal_consistency 4.5 s → 12.9 s, total +33%) —
  * strictly worse than letting Spark's allocation pressure drive
  * collection.
  *
  * The JSON line goes to stdout AND to a file (SPARK_GRAFT_BENCH_OUT,
  * default bench.json) — the driver keeps only a 2,000-char stdout tail,
  * which truncated the round-4 and round-5 per-query maps. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GraftSession: kernels via spark.sql.extensions + the scale defaults
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM before timing: first-query cost is otherwise dominated by
    // classloading + codegen + parquet-footer machinery, not query work.
    spark.range(100000).selectExpr("id", "id % 7 AS k")
      .groupBy("k").count().write.format("noop").mode("overwrite").save()
    // Touch every input table once (footer cache + OS page cache) so the
    // first query over each table measures compute, not first-read I/O —
    // q_dedup_exact was absorbing the entire cold documents scan (~13s at
    // sf0.1) purely by running first alphabetically.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // events
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.load(spark, sfDir, t)
        .write.format("noop").mode("overwrite").save()
    }
    // No args (the driver's invocation): every query, warmup + 2 timed
    // passes. Dev use: pass query names, optionally repeated, to time a
    // subset once each in one JVM (no warmup pass — first sample pays
    // codegen, as an isolated dev run would).
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else args.toSeq.map(n => n -> SparkEntry.queries(n))
    def once(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      // Teardown OFF the clock: unpersist this query's caches, then give
      // the ContextCleaner/GC a drain pause — otherwise the async
      // unpersist/broadcast-removal debt lands on the NEXT query's timed
      // window (the diagnosed source of the "runs right after heavy work"
      // instability cluster). NO System.gc() here — see the scaladoc A/B.
      spark.catalog.clearCache()
      Thread.sleep(150)
      (dt, ok)
    }
    val passes = if (args.isEmpty) {
      selected.foreach { case (n, f) => once(n, f) } // warmup, discarded
      3
    } else 1
    // pass-major order: the same query's samples are a full pass apart
    val samples = (1 to passes).map { _ =>
      selected.map { case (n, f) => once(n, f) }
    }
    val results = selected.zipWithIndex.map { case ((name, _), i) =>
      val runs = samples.map(_(i))
      // min over SUCCESSFUL runs — a fast failure must not masquerade as
      // steady-state time; if every run failed, report the (slow) failure
      // time rather than poisoning the JSON with infinities
      val good = runs.filter(_._2)
      val times = (if (good.nonEmpty) good else runs).map(_._1).sorted
      (name, times.min, times(times.size / 2))
    }
    // Unstable = the MEDIAN diverges >3× from the min: a single transient
    // spike among three separated samples no longer flags (the min and the
    // median both sit on the steady state), but a query that is genuinely
    // bimodal across passes still does.
    val unstable = results.collect {
      case (n, lo, med) if med > 3.0 * lo => n
    }
    val qs = results.map { case (k, lo, _) => "\"" + k + "\":" + f"$lo%.3f" }
      .mkString("{", ",", "}")
    val un = unstable.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"unstable":$un,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: $e") }
    spark.stop()
  }
}
