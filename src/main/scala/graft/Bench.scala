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
  * per-query codegen/JIT, then TWO timed passes separated by the length of
  * a full pass — a spike has to recur minutes apart on the same query to
  * survive the min. Queries whose two timed samples still diverge >3× are
  * reported in "unstable" rather than trusted. Every timed sample starts
  * cache-cold (clearCache after each execution — operators cache()
  * intermediates they cannot unpersist themselves), matching how a query
  * runs in isolation; before this, leaked caches measured 4-6× slowdowns
  * on later-alphabet queries.
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
      spark.catalog.clearCache()
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val passes = if (args.isEmpty) {
      selected.foreach { case (n, f) => once(n, f) } // warmup, discarded
      2
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
      val times = (if (good.nonEmpty) good else runs).map(_._1)
      (name, times.min, times.max)
    }
    val unstable = results.collect {
      case (n, lo, hi) if hi > 3.0 * lo => n
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
