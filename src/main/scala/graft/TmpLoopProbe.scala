package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: time the C18 component loop at sf0.1. */
object TmpLoopProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val (df, rounds) = operators.DedupOps.dedupComponentsWithRounds(spark, dir)
      val tLoop = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tAll = System.nanoTime()
      println(f"rep $rep: rounds=$rounds loop=${(tLoop - t0) / 1e9}%.2f s full=${(tAll - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
