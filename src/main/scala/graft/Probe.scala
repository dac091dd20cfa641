package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q5_nation_revenue", "q_incremental_sync", "q_validate_clients", "q3_top_unshipped", "q1_pricing_summary")) {
      println(s"########## $q")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // keep it terse: join nodes, scans, filters pushed
      plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Scan") || l.contains("PushedFilters") ||
        l.contains("ReadSchema") || l.contains("Exchange") || l.contains("PartitionFilters"))
        .foreach(println)
    }
    spark.stop()
  }
}
