package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One assigned feed document entering the semantic-drift monitor: its
  * source and the cluster its (fetched-bytes) embedding landed in. */
case class SemDoc(source: String, cluster: Long)

/** Per-source running feed cluster histogram + emit revision. Key space per
  * source is CLOSED (≤ k clusters), so state is O(sources × k) forever. */
case class SemState(counts: Map[Long, Long], feedDocs: Long, rev: Long)

/** One revision of a source's semantic-drift report (columns mirror batch
  * C78 plus the revision; identical exact arithmetic, so max-rev rows match
  * the batch report bit-for-bit on the sources the stream saw). */
case class SemOut(source: String, rev: Long, base_docs: Long,
                  feed_docs: Long, tv_cluster: Option[Double],
                  top_cluster: Option[Long], top_gap: Option[Double])

/** Frozen per-source baseline cluster mix — the second frozen artifact next
  * to D19's codebook (sources × k integer counters: model-sized). */
case class SemBase(baseDocs: Long, counts: Map[Long, Long])

/** D26: streaming twin of EmbeddingOps.semanticDrift (C78) — the semantic
  * drift gate run continuously: a source whose pages changed MEANING
  * mid-crawl alarms while the crawl is running (D22's argument applied to
  * the cluster mix instead of the length/language histogram).
  *
  * Deployed shape: two frozen artifacts — D19's codebook assigns each
  * arriving embedding to a cluster (stateless, upstream of this monitor),
  * and the per-source baseline cluster mix (≤ sources × k integer
  * counters, model-sized, so it lives in the task closure like D22's
  * histogram). The monitor itself holds the running feed cluster counters
  * per source in `flatMapGroupsWithState` state — O(sources × k) forever,
  * no watermark — and re-derives the full C78 report per revision with
  * exact BigInt cross products and the batch query's association order, so
  * max-rev rows equal batch C78 bit-for-bit (spec-pinned). Sources absent
  * from the stream emit nothing; the batch report owns went-dark.
  */
object SemanticDriftStream {

  /** Batch C78's feed-side prep as a reusable frame: the incoming batch's
    * (source, assigned cluster) rows, with re-fetched pages carrying the
    * cluster OF THE BYTES THEY FETCHED. `asg` is the frozen assignment
    * relation (vec_id, cluster) from the D19 codebook. Specs build the
    * stream input and the batch comparison from the same rows. */
  def prep(spark: SparkSession, dir: String, asg: DataFrame): Dataset[SemDoc] = {
    import graft.sources.{Feeds, Tables}
    implicit val enc = Encoders.product[SemDoc]
    Tables.documents(spark, dir)
      .filter(col("doc_id") % Feeds.IncrMod === Feeds.IncrRem)
      .select(col("source"),
        when(col("doc_id") % Feeds.RefetchMod === Feeds.IncrRem,
          col("doc_id") - Feeds.IncrRem).otherwise(col("doc_id"))
          .as("vec_id"))
      .join(asg, Seq("vec_id"))
      .select(col("source"), col("cluster").cast("long").as("cluster"))
      .as[SemDoc]
  }

  /** Freeze the per-source baseline cluster mix: the corpus collapses
    * distributed onto the closed (source, cluster) grid; only those
    * counter rows reach the driver (a model freeze, never a data
    * collect). */
  def baseModel(spark: SparkSession, dir: String,
      asg: DataFrame): Map[String, SemBase] = {
    val grid = graft.sources.Tables.documents(spark, dir)
      .select(col("source"), col("doc_id").as("vec_id"))
      .join(asg, Seq("vec_id"))
      .groupBy("source", "cluster").agg(count(lit(1)).as("c"))
      .collect()
    grid.groupBy(_.getString(0)).map { case (src, rows) =>
      val cells = rows.toSeq.map(r => (r.getLong(1), r.getLong(2)))
      src -> SemBase(cells.map(_._2).sum, cells.toMap)
    }
  }

  private def tvNum(base: Map[Long, Long], feed: Map[Long, Long],
      baseDocs: Long, feedDocs: Long): BigInt =
    (base.keySet ++ feed.keySet).foldLeft(BigInt(0)) { (acc, k) =>
      val a = BigInt(base.getOrElse(k, 0L)); val b = BigInt(feed.getOrElse(k, 0L))
      acc + (a * BigInt(feedDocs) - b * BigInt(baseDocs)).abs
    }

  private def driftFunc(base: Map[String, SemBase])(
      source: String, docs: Iterator[SemDoc],
      state: GroupState[SemState]): Iterator[SemOut] = {
    val s0 = state.getOption.getOrElse(SemState(Map.empty, 0L, 0L))
    var counts = s0.counts; var n = s0.feedDocs
    docs.foreach { d =>
      counts = counts.updated(d.cluster, counts.getOrElse(d.cluster, 0L) + 1L)
      n += 1L
    }
    val rev = s0.rev + 1
    state.update(SemState(counts, n, rev))
    val bh = base.getOrElse(source, SemBase(0L, Map.empty))
    val (a, b) = (bh.baseDocs, n)
    val num = tvNum(bh.counts, counts, a, b)
    val tv = if (b == 0) None
      else Some(num.toDouble / ((2.0 * a.toDouble) * b.toDouble))
    val devs = (bh.counts.keySet ++ counts.keySet).toSeq.map { k =>
      (k, (BigInt(bh.counts.getOrElse(k, 0L)) * BigInt(b)
        - BigInt(counts.getOrElse(k, 0L)) * BigInt(a)).abs)
    }
    val top = if (devs.isEmpty) None
      else Some(devs.minBy { case (k, dev) => (-dev, k) })
    val topGap = top.flatMap { case (_, dev) =>
      if (b == 0) None else Some(dev.toDouble / (a.toDouble * b.toDouble))
    }
    Iterator.single(SemOut(source, rev, a, b, tv, top.map(_._1), topGap))
  }

  /** Streaming (or batch) semantic-drift monitoring against the frozen
    * baseline mix. */
  def monitor(feed: Dataset[SemDoc],
      base: Map[String, SemBase]): Dataset[SemOut] = {
    implicit val outEnc = Encoders.product[SemOut]
    implicit val stEnc = Encoders.product[SemState]
    feed.groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(driftFunc(base))
  }
}
