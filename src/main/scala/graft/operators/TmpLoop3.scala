package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: real dedupComponentsWithRounds vs inline copy, same JVM. */
object TmpLoop3 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
    })
    def timed(tag: String)(f: => Unit): Unit = {
      Thread.sleep(400); val j0 = jobs.get; val t0 = System.nanoTime()
      f
      Thread.sleep(400)
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get - j0}")
    }
    for (rep <- 1 to 3) {
      timed(s"rep$rep REAL loop") {
        DedupOps.dedupComponentsWithRounds(spark, dir): Unit
      }
      spark.catalog.clearCache()
      timed(s"rep$rep COPY loop") { copyLoop(spark, dir) }
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  def copyLoop(spark: SparkSession, dir: String): Unit = {
    import DedupOps._
    val mins = graft.operators.TmpLoop2.minhashMinsP(spark, dir)
    val sigs = graft.operators.TmpLoop2.bucketRowsP(mins)
      .select(col("doc_id"), concat_ws("#",
        col("band"), col("k1"), col("k2"), col("k3")).as("bucket"))
    val shared = sigs.groupBy("bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("bucket")
    val multi = sigs.join(shared, Seq("bucket")).cache()
    def labelSum(df: DataFrame): Long = {
      val row = df.agg(sum("label")).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    var labels: DataFrame = multi.select(col("doc_id").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(eager = false)
    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < 50) {
      def sweep(ls: DataFrame): DataFrame = {
        val bmin = multi.join(ls, multi("doc_id") === ls("node"))
          .groupBy("bucket").agg(min("label").as("blabel"))
        multi.join(bmin, Seq("bucket"))
          .groupBy("doc_id").agg(min("blabel").as("label"))
          .select(col("doc_id").as("node"), col("label"))
      }
      val swept = sweep(sweep(labels))
      val next = swept.as("x")
        .join(swept.select(col("node").as("l_node"), col("label").as("l_label")),
          col("x.label") === col("l_node"), "left")
        .select(col("x.node").as("node"),
          least(col("x.label"), coalesce(col("l_label"), col("x.label"))).as("label"))
        .localCheckpoint(eager = false)
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      it += 1
    }
    multi.unpersist(): Unit
  }
}
