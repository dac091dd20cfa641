package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document entering the packer: its source and token count. */
case class PackDoc(source: String, doc_id: Long, n_tok: Long)

/** Running token total per source — the ENTIRE packer state: one long. */
case class PackTotal(total: Long)

/** A doc's pack placement (same contract as the batch C28 columns). */
case class PackOut(source: String, doc_id: Long, n_tok: Long,
                   tok_offset: Long, pack_id: Long, pack_pos: Long,
                   cruza_limite: Boolean)

/** D10: streaming twin of Pipeline.corpusPack (C28) — continuous
  * concat-and-cut sequence packing for an ingestion stream: each arriving
  * document is placed at the source's running token offset and cut into
  * fixed-budget packs by pure integer arithmetic. State per source is ONE
  * long (the running total) — O(sources) forever, no watermark or
  * eviction needed, which is why packing streams so well: placement
  * depends only on a prefix sum.
  *
  * Ordering contract (same as the batch twin's doc_id window): per-source
  * docs must arrive in doc_id order across micro-batches; within a batch
  * they are sorted here. Batch-mode equivalence to `corpusPack` is
  * spec-pinned row-for-row. */
object PackStream {

  private def packFunc(budget: Long)(
      source: String, docs: Iterator[PackDoc],
      state: GroupState[PackTotal]): Iterator[PackOut] = {
    var total = state.getOption.map(_.total).getOrElse(0L)
    val out = Vector.newBuilder[PackOut]
    docs.toVector.sortBy(_.doc_id).foreach { d =>
      val off = total
      val packId = off / budget
      out += PackOut(source, d.doc_id, d.n_tok, off, packId, off % budget,
        (off + d.n_tok - 1) / budget != packId)
      total = off + d.n_tok
    }
    state.update(PackTotal(total))
    out.result().iterator
  }

  /** Streaming (or batch) packing. Append-mode; no watermark required. */
  def pack(docs: Dataset[PackDoc],
           budget: Long = graft.operators.Pipeline.PackBudget.toLong): Dataset[PackOut] = {
    implicit val outEnc = Encoders.product[PackOut]
    implicit val stEnc = Encoders.product[PackTotal]
    docs.groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(packFunc(budget))
  }

  private def effFunc(budget: Long)(
      source: String, docs: Iterator[PackDoc],
      state: GroupState[EffState]): Iterator[EffOut] = {
    val s0 = state.getOption.getOrElse(EffState(0L, 0L, 0L, 0L))
    var total = s0.total; var n = s0.n_docs; var cr = s0.n_cruzan
    docs.toVector.sortBy(_.doc_id).foreach { d =>
      val packId = total / budget
      if ((total + d.n_tok - 1) / budget != packId) cr += 1
      total += d.n_tok; n += 1
    }
    val rev = s0.rev + 1
    state.update(EffState(total, n, cr, rev))
    val packs = (total + budget - 1) / budget
    Iterator.single(EffOut(source, rev, n, total, cr, packs,
      packs * budget - total,
      total.toDouble / (packs * budget).toDouble))
  }

  /** D15: streaming twin of Pipeline.packEfficiency (C50) — the packing QA
    * report maintained continuously: every aggregate the batch report
    * derives (pack count, straddlers, padding, fill efficiency) is a pure
    * function of (running total, doc count, straddler count), so the state
    * extends D10's single long by TWO more and stays O(sources) forever —
    * no watermark, no eviction. Straddler detection uses the same integer
    * arithmetic as the packer itself, at the same running offset. Each
    * micro-batch that touches a source emits a REVISION of its row (D11's
    * pattern — an append stream can't retract); readers take the max-rev
    * row per source, and the max-rev generation equals the batch C50
    * report bit-for-bit (spec-pinned, the division included — same two
    * exact longs on both sides). */
  def runningEfficiency(docs: Dataset[PackDoc],
      budget: Long = graft.operators.Pipeline.PackBudget.toLong): Dataset[EffOut] = {
    implicit val outEnc = Encoders.product[EffOut]
    implicit val stEnc = Encoders.product[EffState]
    docs.groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(effFunc(budget))
  }
}

/** Running per-source packing totals for D15: the packer offset plus the
  * doc/straddler counters and an emit revision. */
case class EffState(total: Long, n_docs: Long, n_cruzan: Long, rev: Long)

/** One revision of a source's efficiency report (columns mirror C50,
  * plus the revision number). */
case class EffOut(source: String, rev: Long, n_docs: Long, n_tokens: Long,
                  n_cruzan: Long, n_packs: Long, relleno_final: Long,
                  eficiencia: Double)
