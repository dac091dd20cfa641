package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4). AQE's skew-join split handles
  * most cases at runtime; explicit salting remains necessary when one side
  * must be aggregated on a hot key (AQE cannot split a hash-aggregate
  * partition) or when a medium-sized build side defeats both broadcast and
  * AQE's sort-merge splitting. These helpers keep the pattern in one audited
  * place instead of re-derived per query.
  */
object Skew {

  /** Salted equi-join: the large (skewed) side gets a uniform random-free
    * deterministic salt derived from a high-entropy column, the small side is
    * replicated `factor` times, and the join keys on (key, salt). Each hot
    * key's rows spread over `factor` partitions at the cost of replicating
    * the small side — use when the small side is too big to broadcast but
    * far smaller than the hot key's row count.
    *
    * `entropy` must be a column of the large side that varies within a key
    * (a row id, line number, hash of the payload); using a deterministic
    * salt keeps reruns and AQE re-optimizations stable.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 entropy: Column, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val salted = large.withColumn("_salt", pmod(hash(entropy), lit(factor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for hot grouping keys: partial-aggregate on
    * (key, salt) first, then merge the partials per key. `merge` maps each
    * phase-1 output column to the expression that combines partials (sum of
    * sums, sum of counts, max of maxes, ...). Catalyst's own partial/final
    * split already does this per-partition; the explicit salt phase matters
    * when a single key exceeds one task's memory — the classic 100 TB hot
    * key (empty string, null-ish sentinel, bot user id).
    */
  def saltedAgg(df: DataFrame, key: String, entropy: Column, factor: Int,
                partials: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    df.withColumn("_salt", pmod(hash(entropy), lit(factor)))
      .groupBy(col(key), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }
}
