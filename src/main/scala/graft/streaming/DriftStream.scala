package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One feed document entering the drift monitor: its source, declared
  * language, and token count (the same three measures batch C69 grids). */
case class DriftDoc(source: String, lang: String, n_tok: Long)

/** Per-source running feed histogram: (len-bucket, lang) counters plus the
  * derived marginals' inputs and an emit revision. The key space per source
  * is CLOSED (≤ 6 len buckets × observed langs), so state is O(sources ×
  * buckets × langs) forever — no watermark, no eviction. */
case class DriftState(lenCounts: Map[Int, Long], langCounts: Map[String, Long],
                      feedDocs: Long, rev: Long)

/** One revision of a source's drift report (columns mirror batch C69 plus
  * the revision number; doubles are computed from the same exact integers
  * with the same association order, so max-rev rows match the batch
  * report bit-for-bit). */
case class DriftOut(source: String, rev: Long, base_docs: Long,
                    feed_docs: Long, tv_len: Option[Double],
                    tv_lang: Option[Double], top_len_bucket: Option[Int],
                    top_len_gap: Option[Double])

/** Frozen per-source baseline histogram — the "model" the stream scores
  * against (the D16/D18/D19 frozen-artifact pattern). */
case class BaseHist(baseDocs: Long, len: Map[Int, Long], lang: Map[String, Long])

/** D22: streaming twin of Pipeline.sourceDrift (C69) — the per-source
  * distribution-drift gate maintained continuously over the ingest stream,
  * so a crawler that starts pulling a different page class alarms
  * MID-crawl, not at the end-of-day batch comparison (the D21 argument
  * applied to shape instead of PII).
  *
  * Design: the standing-corpus side of C69 is FROZEN at stream start as a
  * per-source histogram — ≤ sources × 6 len buckets × langs integer
  * counters, a genuinely MODEL-sized artifact (hundreds of longs at any
  * corpus scale, because the grid's key space is closed), so closing over
  * it is freezing a model, not collecting data — the same contract as
  * D16's frozen LM and D19's frozen codebook, just small enough to live in
  * the task closure instead of a join. The stream side accumulates the
  * SAME grid per source in `flatMapGroupsWithState` state and re-derives
  * the full C69 report on every revision: TV numerators as exact BigInt
  * cross products (Σ|a_i·B − b_i·A| — BIGINT products overflow past
  * ~3·10⁹ docs per side, and a float sum would be order-dependent), then
  * the identical final divisions in the identical association order, so a
  * max-rev row equals the batch row bit-for-bit (spec-pinned). Sources
  * that never appear in the stream emit nothing — the batch report owns
  * the went-dark alarm (it sees the full source universe); the stream
  * owns the shape-shift alarm for live sources.
  */
object DriftStream {

  /** C69's length-bucket rule, as plain Scala (same [[graft.operators.Pipeline.DriftEdges]]). */
  def lenBucket(nTok: Long): Int = {
    val edges = graft.operators.Pipeline.DriftEdges
    val i = edges.indexWhere(nTok < _)
    if (i < 0) edges.size else i
  }

  /** Feed prep mirroring batch C69's measure extraction — specs build the
    * stream input and the batch comparison from the same rows. */
  def prep(docs: DataFrame): Dataset[DriftDoc] = {
    implicit val enc = Encoders.product[DriftDoc]
    docs.filter(length(trim(col("text"))) > 0)
      .select(col("source"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .as[DriftDoc]
  }

  /** Freeze the standing corpus into the per-source baseline model. The
    * corpus collapses DISTRIBUTED onto the closed (source, lenb, lang)
    * grid — one map-side-combined aggregate, exactly batch C69's grid —
    * and only those ≤ sources·buckets·langs counter rows reach the
    * driver: a model freeze, never a data collect. */
  def baseModel(spark: SparkSession, dir: String): Map[String, BaseHist] = {
    val edges = graft.operators.Pipeline.DriftEdges
    val lenbCol = edges.zipWithIndex.foldRight(lit(edges.size)) {
      case ((edge, i), rest) => when(col("n_tok") < edge, i).otherwise(rest)
    }
    val grid = prep(graft.sources.Tables.documents(spark, dir)).toDF()
      .select(col("source"), lenbCol.as("lenb"), col("lang"))
      .groupBy("source", "lenb", "lang").agg(count(lit(1)).as("c"))
      .collect()
    grid.groupBy(_.getString(0)).map { case (src, rows) =>
      val cells = rows.toSeq.map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
      val len = cells.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._3).sum }
      val lang = cells.groupBy(_._2).map { case (l, xs) => l -> xs.map(_._3).sum }
      src -> BaseHist(cells.map(_._3).sum, len, lang)
    }
  }

  /** TV numerator Σ|a_i·B − b_i·A| over the union of both key sets, as an
    * exact BigInt (order-independent integer arithmetic — the C69 rule). */
  private def tvNum[K](base: Map[K, Long], feed: Map[K, Long],
      baseDocs: Long, feedDocs: Long): BigInt =
    (base.keySet ++ feed.keySet).foldLeft(BigInt(0)) { (acc, k) =>
      val a = BigInt(base.getOrElse(k, 0L)); val b = BigInt(feed.getOrElse(k, 0L))
      acc + (a * BigInt(feedDocs) - b * BigInt(baseDocs)).abs
    }

  private def driftFunc(base: Map[String, BaseHist])(
      source: String, docs: Iterator[DriftDoc],
      state: GroupState[DriftState]): Iterator[DriftOut] = {
    val s0 = state.getOption.getOrElse(DriftState(Map.empty, Map.empty, 0L, 0L))
    var len = s0.lenCounts; var lang = s0.langCounts; var n = s0.feedDocs
    docs.foreach { d =>
      val b = lenBucket(d.n_tok)
      len = len.updated(b, len.getOrElse(b, 0L) + 1L)
      lang = lang.updated(d.lang, lang.getOrElse(d.lang, 0L) + 1L)
      n += 1L
    }
    val rev = s0.rev + 1
    state.update(DriftState(len, lang, n, rev))
    val bh = base.getOrElse(source, BaseHist(0L, Map.empty, Map.empty))
    val (a, b) = (bh.baseDocs, n)
    // identical association order to the batch columns: num / ((2·A)·B)
    def tv(num: BigInt): Option[Double] =
      if (b == 0) None
      else Some(num.toDouble / ((2.0 * a.toDouble) * b.toDouble))
    val numLen = tvNum(bh.len, len, a, b)
    val numLang = tvNum(bh.lang, lang, a, b)
    // worst length bucket: max |dev|, ties to the smallest bucket id
    val devs = (bh.len.keySet ++ len.keySet).toSeq.map { k =>
      val dev = (BigInt(bh.len.getOrElse(k, 0L)) * BigInt(b)
        - BigInt(len.getOrElse(k, 0L)) * BigInt(a)).abs
      (k, dev)
    }
    val top = if (devs.isEmpty) None
      else Some(devs.minBy { case (k, dev) => (-dev, k) })
    val topB = top.map(_._1)
    val topGap = top.flatMap { case (_, dev) =>
      if (b == 0) None
      else Some(dev.toDouble / (a.toDouble * b.toDouble))
    }
    Iterator.single(DriftOut(source, rev, a, b, tv(numLen), tv(numLang),
      topB, topGap))
  }

  /** Streaming (or batch) drift monitoring against a frozen baseline. */
  def monitor(feed: Dataset[DriftDoc],
      base: Map[String, BaseHist]): Dataset[DriftOut] = {
    implicit val outEnc = Encoders.product[DriftOut]
    implicit val stEnc = Encoders.product[DriftState]
    feed.groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(driftFunc(base))
  }
}
