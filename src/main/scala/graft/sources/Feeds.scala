package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Simulated *incoming* feeds — the engine's stand-in for the reference's
  * Bsale API payloads. The star-schema parquet carries only derived columns
  * (a single total, no independently-supplied net/tax, no cost endpoint),
  * while the reference validates fields the API supplies independently
  * (/root/reference/app/services/etl_service.py:125-141,182-188,588-615).
  * This object is the ONE place that synthesizes those incoming fields —
  * including the deterministic dirty slices that make validation's false
  * branches reachable — so the operators in [[graft.operators.Etl]] validate
  * whatever the feed carries, exactly like the reference validates whatever
  * the API returns. Each feed ships its DuckDB twin SQL for oracle CTEs.
  *
  * All cent math is floor(x·100 + 0.5) over doubles — bit-identical across
  * engines (integer-valued doubles are exact below 2^53, SURVEY.md §3).
  */
object Feeds {

  /** Incoming sale documents: the three independently-supplied amounts
    * (monto_total / monto_neto / monto_iva) the reference's
    * `validate_document` checks against each other (etl_service.py:125-141).
    * Clean rows: net = total/1.19 in rounded cents, IVA = total − net. Dirty
    * slice (id % 97 == 0): IVA computed at the pre-reform 18% rate — the
    * incoherent feed the coherence warning exists to catch. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").as("id_documento"),
        col("o_custkey").as("id_cliente"),
        col("o_orderstatus").as("estado_doc"),
        col("o_orderdate").cast("date").as("fecha_emision"),
        col("o_totalprice").as("monto_total"))
      .withColumn("total_c",
        floor(col("monto_total") * lit(100.0) + lit(0.5)).cast("double"))
      .withColumn("neto_c",
        floor(col("total_c") / lit(1.19) + lit(0.5)).cast("double"))
      .withColumn("iva_c",
        when(col("id_documento") % 97 === 0,
          floor(col("neto_c") * lit(0.18) + lit(0.5)).cast("double"))
          .otherwise(col("total_c") - col("neto_c")))
      .withColumn("monto_neto", col("neto_c") / lit(100.0))
      .withColumn("monto_iva", col("iva_c") / lit(100.0))
      .drop("total_c", "neto_c", "iva_c")

  /** DuckDB twin of [[documents]] (a full SELECT, usable as a CTE body). */
  val documentsSql: String = """
    SELECT id_documento, id_cliente, estado_doc, fecha_emision, monto_total,
      neto_c / 100.0 AS monto_neto, iva_c / 100.0 AS monto_iva
    FROM (
      SELECT *, CASE WHEN id_documento % 97 = 0
          THEN floor(neto_c * CAST(0.18 AS DOUBLE) + 0.5)
          ELSE total_c - neto_c END AS iva_c
      FROM (
        SELECT *, floor(total_c / CAST(1.19 AS DOUBLE) + 0.5) AS neto_c
        FROM (
          SELECT o_orderkey AS id_documento, o_custkey AS id_cliente,
            o_orderstatus AS estado_doc, CAST(o_orderdate AS DATE) AS fecha_emision,
            o_totalprice AS monto_total,
            floor(o_totalprice * CAST(100.0 AS DOUBLE) + 0.5) AS total_c
          FROM orders)))"""

  /** Incoming document lines: the independently-supplied line net total the
    * reference checks against qty·unit·(1−disc/100) (etl_service.py:182-188).
    * Clean rows carry extendedprice·(1−discount); the dirty slice
    * ((orderkey+linenumber) % 89 == 0) carries the undiscounted amount — a
    * feed that forgot to apply the discount. */
  def details(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey").as("id_documento"),
        col("l_linenumber").as("numero_linea"),
        col("l_partkey").as("id_producto"),
        col("l_quantity").as("cantidad"),
        (col("l_extendedprice") / col("l_quantity")).as("precio_neto_unitario"),
        (col("l_discount") * lit(100.0)).as("descuento_porcentual"),
        when((col("l_orderkey") + col("l_linenumber")) % 89 === 0,
          col("l_extendedprice"))
          .otherwise(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("monto_total_linea"))

  /** DuckDB twin of [[details]]. */
  val detailsSql: String = """
    SELECT l_orderkey AS id_documento, l_linenumber AS numero_linea,
      l_partkey AS id_producto, l_quantity AS cantidad,
      l_extendedprice / l_quantity AS precio_neto_unitario,
      l_discount * 100.0 AS descuento_porcentual,
      CASE WHEN (l_orderkey + l_linenumber) % 89 = 0 THEN l_extendedprice
           ELSE l_extendedprice * (1.0 - l_discount) END AS monto_total_linea
    FROM lineitem"""

  /** Per-product average historical unit cost — the stand-in for the
    * reference's `variants/{id}/costs.json` history endpoint
    * (etl_service.py:600-609). Cost entries are unit net prices after
    * discount, averaged in integer cents (exact, order-independent). Products
    * with id % 7 == 0 are absent — the simulated slice of variants whose cost
    * endpoint returns no positive history, which makes the price·0.65
    * fallback branch of `validate_product` reachable. */
  def costHistory(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_partkey") % 7 =!= 0 && col("l_quantity") > 0)
      .select(col("l_partkey").as("id_producto"),
        floor((col("l_extendedprice") / col("l_quantity")) *
          (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5)).as("costo_c"))
      .filter(col("costo_c") > 0)
      .groupBy("id_producto")
      .agg((sum("costo_c").cast("double") / count(lit(1)) / lit(100.0))
        .as("costo_promedio"))

  /** DuckDB twin of [[costHistory]]. DuckDB widens SUM(BIGINT) to HUGEINT;
    * the CAST to DOUBLE keeps the division identical to Spark's. */
  val costHistorySql: String = """
    SELECT id_producto,
      CAST(SUM(costo_c) AS DOUBLE) / COUNT(*) / 100.0 AS costo_promedio
    FROM (
      SELECT l_partkey AS id_producto,
        CAST(floor((l_extendedprice / l_quantity) * (1.0 - l_discount)
          * CAST(100.0 AS DOUBLE) + 0.5) AS BIGINT) AS costo_c
      FROM lineitem WHERE l_partkey % 7 <> 0 AND l_quantity > 0)
    WHERE costo_c > 0 GROUP BY id_producto"""

  /** Document corpus with a deterministic PII slice — docs with
    * doc_id % 13 == 0 carry an appended contact line (email + Chilean phone)
    * so the PII scrubber ([[graft.operators.TextOps.piiScrub]]) has real
    * redactions to make; the clean corpus carries none. */
  def documentsWithPii(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" contacto: cliente"),
            col("doc_id").cast("string"), lit("@imperio.cl tel +56 9 "),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" 1234")))
          .otherwise(col("text")).as("text"))

  /** DuckDB twin of [[documentsWithPii]]. */
  val documentsWithPiiSql: String = """
    SELECT doc_id, source, lang,
      CASE WHEN doc_id % 13 = 0
        THEN text || ' contacto: cliente' || CAST(doc_id AS VARCHAR)
          || '@imperio.cl tel +56 9 '
          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' 1234'
        ELSE text END AS text
    FROM documents"""

  /** Price-list-2 analog — the mandatory per-variant net price the reference
    * fetches from `price_lists/2/details.json` and *rejects the variant*
    * when absent (etl_service.py:588-594). Products with id % 53 == 0 have
    * no price-list row, so the reject-on-missing path is exercised. */
  def priceList(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") % 53 =!= 0)
      .select(col("p_partkey").as("id_producto"),
        col("p_retailprice").as("precio_lista"))

  /** Document corpus with a deterministic MARKUP slice — docs with
    * doc_id % 11 == 0 arrive wrapped in scraped-page debris (tags + HTML
    * entities), the shape a web-crawl feed actually has; the clean slice
    * carries none. Gives the markup scrubber
    * ([[graft.operators.TextOps.htmlStrip]]) real work, like the PII slice
    * does for the PII scrubber. */
  def documentsWithMarkup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        when(col("doc_id") % 11 === 0,
          concat(lit("<div class=\"post\"><p>"), col("text"),
            lit("</p><br/>&nbsp;m&aacute;s &amp; info</div>")))
          .otherwise(col("text")).as("text"))

  /** DuckDB twin of [[documentsWithMarkup]]. */
  val documentsWithMarkupSql: String = """
    SELECT doc_id, source, lang,
      CASE WHEN doc_id % 11 = 0
        THEN '<div class="post"><p>' || text ||
             '</p><br/>&nbsp;m&aacute;s &amp; info</div>'
        ELSE text END AS text
    FROM documents"""

  /** DuckDB twin of [[priceList]]. */
  val priceListSql: String = """
    SELECT p_partkey AS id_producto, p_retailprice AS precio_lista
    FROM part WHERE p_partkey % 53 <> 0"""

  /** Modulus splitting the corpus into the STANDING slice and the incoming
    * batch for the incremental-dedup family (C58/D18): docs with
    * doc_id % [[IncrMod]] == [[IncrRem]] arrive as "today's crawl", the
    * rest are the already-ingested corpus the new batch dedups against. */
  val IncrMod: Int = 10

  /** Residue selecting the incoming batch (see [[IncrMod]]). */
  val IncrRem: Int = 7

  /** Every [[RefetchMod]]-th doc_id is a RE-FETCH (see [[incomingDocs]]). */
  val RefetchMod: Int = 30

  /** Incoming re-crawl batch for the incremental deduper (C58/D18): the
    * doc_id % [[IncrMod]] == [[IncrRem]] slice posing as today's crawl,
    * where every third incoming page (doc_id % [[RefetchMod]] ==
    * [[IncrRem]]) is a byte-identical RE-FETCH of a standing page (the
    * doc_id − [[IncrRem]] page, which sits in the standing slice) — the
    * exact-dup class an incremental deduper must drop on sight. The rest
    * carry their own text: mostly novel, with the corpus's natural
    * near-dup families exercising the band-collision class. One id-keyed
    * equi-join against the standing corpus; the batch side is the small
    * side at any scale. */
  def incomingDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val src = docs.select(col("doc_id").as("src_id"), col("text").as("src_text"))
    docs.filter(col("doc_id") % IncrMod === IncrRem)
      .join(src, col("doc_id") - IncrRem === col("src_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % RefetchMod === IncrRem,
          coalesce(col("src_text"), col("text")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"))
  }

  /** DuckDB twin of [[incomingDocs]] (a full SELECT, usable as a CTE body). */
  val incomingDocsSql: String = s"""
    SELECT i.doc_id,
      CASE WHEN i.doc_id % $RefetchMod = $IncrRem
        THEN coalesce(s.text, i.text) ELSE i.text END AS text,
      i.lang, i.source
    FROM documents i LEFT JOIN documents s ON s.doc_id = i.doc_id - $IncrRem
    WHERE i.doc_id % $IncrMod = $IncrRem"""

  /** doc_id residue classes defining the re-crawl snapshot's mutation
    * slices (see [[recrawlSnapshot]]). Pairwise-coprime moduli so the
    * gone/edited/cloned classes overlap naturally (gone wins over edited:
    * a page that disappeared cannot also ship an edit). */
  val GoneMod: Int = 17;  val GoneRem: Int = 3
  val EditMod: Int = 13;  val EditRem: Int = 5
  val CloneMod: Int = 19; val CloneRem: Int = 11
  /** Id offset of cloned (newly-discovered) pages — far above any test
    * corpus id so clone ids never collide with standing ids. */
  val CloneBase: Long = 10000000L

  /** The corpus RE-CRAWLED: yesterday's `documents` as today's crawler saw
    * it. Deterministic mutation slices drive every branch of a snapshot
    * differ: doc_id % [[GoneMod]] == [[GoneRem]] pages are GONE (404 on
    * re-crawl); % [[EditMod]] == [[EditRem]] pages were EDITED (a ' rev2'
    * suffix — content hash must flip); % [[CloneMod]] == [[CloneRem]]
    * pages were each DISCOVERED once more at a new URL (id + [[CloneBase]])
    * with reversed text — new ids a differ must class as additions. One
    * narrow projection + a filtered union of the same scan: no shuffle in
    * the feed itself. */
  def recrawlSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kept = docs.filter(col("doc_id") % GoneMod =!= GoneRem)
      .select(col("doc_id"),
        when(col("doc_id") % EditMod === EditRem,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")).as("text"),
        col("lang"), col("source"))
    val found = docs.filter(col("doc_id") % CloneMod === CloneRem)
      .select((col("doc_id") + CloneBase).as("doc_id"),
        reverse(col("text")).as("text"), col("lang"), col("source"))
    kept.unionByName(found)
  }

  /** DuckDB twin of [[recrawlSnapshot]] (a full SELECT, usable as a CTE
    * body). */
  val recrawlSnapshotSql: String = s"""
    SELECT doc_id,
      CASE WHEN doc_id % $EditMod = $EditRem THEN text || ' rev2'
        ELSE text END AS text, lang, source
    FROM documents WHERE doc_id % $GoneMod <> $GoneRem
    UNION ALL
    SELECT doc_id + $CloneBase AS doc_id, reverse(text) AS text, lang, source
    FROM documents WHERE doc_id % $CloneMod = $CloneRem"""
}
