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
}
