package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: inspect round-0 plan of the C18 loop for subtree duplication. */
object TmpLoop4 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mins = TmpLoop2.minhashMinsP(spark, dir)
    val sigs = TmpLoop2.bucketRowsP(mins)
      .select(col("doc_id"), concat_ws("#",
        col("band"), col("k1"), col("k2"), col("k3")).as("bucket"))
    val shared = sigs.groupBy("bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("bucket")
    val multi = sigs.join(shared, Seq("bucket")).cache()
    val labels = multi.select(col("doc_id").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(eager = false)
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
    val plan = next.queryExecution.executedPlan.toString
    println("=== round-0 next plan (initial, pre-AQE) ===")
    println("HashAggregate nodes: " + "HashAggregate".r.findAllIn(plan).size)
    println("Exchange nodes: " + "Exchange".r.findAllIn(plan).size)
    println("InMemoryTableScan nodes: " + "InMemoryTableScan".r.findAllIn(plan).size)
    println("plan lines: " + plan.linesIterator.size)
    spark.stop()
  }
}
