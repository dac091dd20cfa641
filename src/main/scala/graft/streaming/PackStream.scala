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
}
