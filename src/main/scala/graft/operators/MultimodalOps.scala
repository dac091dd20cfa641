package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Opaque media payload with typed metadata — the multimodal column model:
  * the payload is an untyped byte blob; everything Spark plans on (ids,
  * media type, sizes) is a typed column next to it. */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Deterministic fake "decoded" features — stands in for pixels/samples. */
case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
                         mean_byte: Double, max_byte: Int, frame_count: Int)

/** Multimodal-column plumbing (SURVEY.md §2 C12 support): decode /
  * feature-extract over opaque binary payloads.
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; everything around it — the binary
  * column schema, the per-partition batch iteration shape, the typed
  * feature output — is the real plumbing a codec would drop into.
  *
  * Scale design: decode is per-row CPU behind `mapPartitions`, so it
  * parallelizes with the scan and never shuffles; a real decoder would
  * amortize native-lib init once per partition exactly where `partIter`
  * is constructed below.
  */
object MultimodalOps {

  /** STUB — deterministic fake decode. A real build replaces this body with
    * an actual codec call (e.g. JPEG → pixel array); signature stays. */
  def decodeStub(payload: Array[Byte]): (Double, Int, Int) = {
    if (payload.isEmpty) (0.0, 0, 0)
    else {
      var sum = 0L; var max = 0
      payload.foreach { b => val u = b & 0xff; sum += u; if (u > max) max = u }
      // "frame count": fake 1 frame per 256 bytes, ≥1 — deterministic.
      (sum.toDouble / payload.length, max, 1 + payload.length / 256)
    }
  }

  /** Media table derived from `documents` (utf-8 payloads stand in for real
    * media bytes; media_type cycles deterministically). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Feature extraction: one `mapPartitions` pass — decoder init happens
    * once per partition, rows stream through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { partIter =>
      // real codec: open native decoder HERE, once per partition
      partIter.map { m =>
        val (mean, max, frames) = decodeStub(m.payload)
        MediaFeatures(m.doc_id, m.media_type, m.payload.length.toLong,
          mean, max, frames)
      }
    }
  }

  /** End-to-end: documents → media rows → decoded feature table. */
  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).toDF().orderBy("doc_id")

  /** STUB — deterministic fake resize: a real build decodes, scales to
    * `targetBytes` worth of pixels and re-encodes; the fake keeps every
    * stride-th byte so output size, determinism and the narrow per-row
    * shape are the real contract. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else {
      val stride = math.max(1, payload.length / targetBytes)
      payload.indices.collect { case i if i % stride == 0 => payload(i) }
        .take(targetBytes).toArray
    }

  /** Resize pass: payloads capped at `targetBytes` — same `mapPartitions`
    * shape as [[extractFeatures]] (codec init once per partition). */
  def resize(media: Dataset[MediaRow], targetBytes: Int = 1024): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { partIter =>
      partIter.map(m => m.copy(payload = resizeStub(m.payload, targetBytes)))
    }
  }

  /** One sampled "frame" per media row: frame `frameIdx` is the 256-byte
    * block at that index (matching [[decodeStub]]'s fake frame geometry),
    * clamped to the last frame. Output explodes to one row per sampled
    * frame — the shape a video pipeline feeds to per-frame models. */
  def frameSample(media: Dataset[MediaRow],
                  frameIdxs: Seq[Int] = Seq(0)): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = math.max(1, 1 + m.payload.length / 256)
      frameIdxs.distinct.sorted.map { want =>
        val idx = math.min(want, nFrames - 1)
        val from = idx * 256
        val until = math.min(from + 256, m.payload.length)
        val frame =
          if (from >= m.payload.length) Array.emptyByteArray
          else m.payload.slice(from, until)
        (m.doc_id, m.media_type, idx, frame)
      }
    }.toDF("doc_id", "media_type", "frame_idx", "frame")
  }

  /** Frame size in bytes for [[multimodalFrames]] — matches the fake frame
    * geometry of [[decodeStub]]/[[frameSample]]. */
  val FrameBytes: Int = 256

  /** C37: `q_multimodal_frames` — the oracle-checked frame INVENTORY over
    * the media table: every payload split into its ⌈bytes/[[FrameBytes]]⌉
    * fixed-stride frames (empty payloads keep one empty frame), each frame
    * identified by content hash + byte length — the manifest a video
    * pipeline materializes before farming frames out to per-frame models
    * (the decode itself stays behind [[decodeStub]]; this is the real
    * Spark-side schema/explode/identity plumbing).
    *
    * Exactness: both engines slice the payload in the HEX-string domain
    * (the oracle's DuckDB build has no blob substring) — hex is ASCII so
    * sha256 over the hex slice is byte-identical; lengths are integer
    * arithmetic on the hex length.
    *
    * Scale: ZERO shuffle up to the presentation sort — a codegen'd
    * `sequence` explode (bounded per row by payload size) over a narrow
    * scan, embarrassingly parallel at any corpus size, exactly like C22's
    * token chunking. */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    frameInventory(spark, dir).orderBy("doc_id", "frame_idx")

  /** The unsorted C37 inventory — shared with C77's roll-up so the frame
    * identity rules cannot drift (and the dedup plan never inherits the
    * presentation sort). */
  private def frameInventory(spark: SparkSession, dir: String): DataFrame = {
    val hexPerFrame = FrameBytes * 2
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        hex(col("text").cast("binary")).as("payload_hex"),
        octet_length(col("text")).cast("long").as("blen"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          greatest(lit(1L),
            expr(s"(blen + ${FrameBytes - 1}) DIV $FrameBytes")) - 1L)))
      .withColumn("frame_hex",
        expr(s"substr(payload_hex, frame_idx * $hexPerFrame + 1, $hexPerFrame)"))
      .select(col("doc_id"), col("media_type"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr("length(frame_hex) DIV 2").cast("long").as("frame_len"),
        sha2(col("frame_hex").cast("binary"), 256).as("frame_sha"))
  }

  val multimodalFramesSql: String = {
    val hexPerFrame = FrameBytes * 2
    s"""
    WITH m AS (
      SELECT doc_id,
        (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        hex(encode(text)) AS payload_hex,
        CAST(octet_length(encode(text)) AS BIGINT) AS blen
      FROM documents),
    f AS (
      SELECT doc_id, media_type, payload_hex, CAST(u.f AS BIGINT) AS frame_idx
      FROM m, LATERAL unnest(range(0,
        greatest(1, (blen + ${FrameBytes - 1}) // $FrameBytes))) u(f))
    SELECT doc_id, media_type, frame_idx,
      CAST(length(substr(payload_hex, frame_idx * $hexPerFrame + 1, $hexPerFrame)) // 2
        AS BIGINT) AS frame_len,
      sha256(substr(payload_hex, frame_idx * $hexPerFrame + 1, $hexPerFrame)) AS frame_sha
    FROM f
    ORDER BY doc_id, frame_idx"""
  }

  /** C77: `q_frame_dedup` — exact frame-level dedup across media payloads:
    * C73's span-dedup idea applied to the BINARY modality (and C1's exact
    * dedup pushed below whole-payload granularity). Every repeated
    * [[FrameBytes]]-aligned frame — shared intro/outro footage, a reused
    * thumbnail, a silence block — is one report row: occurrence count,
    * distinct carrier payloads, frame length, first/last carrier. A video
    * pipeline reads this before per-frame model farming (C37's manifest
    * says WHAT to decode; this says what to decode ONCE and link).
    *
    * Exactness: pure roll-up of C37's hex-domain frame identities — no
    * new hashing rules to drift.
    *
    * Scale: C37's zero-shuffle explode collapses straight onto the 32-byte
    * frame-sha grid (map-side combine, the one fact-scaled shuffle); the
    * ≥ 2-payload filter prunes the unique tail at the aggregate; no pair
    * join — a million-fold repeated frame is ONE row (the C73 argument,
    * byte-side). */
  def frameDedup(spark: SparkSession, dir: String): DataFrame =
    frameInventory(spark, dir)
      .groupBy("frame_sha")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct("doc_id").as("n_payloads"),
        max("frame_len").as("frame_len"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .filter(col("n_payloads") >= 2)
      .orderBy("frame_sha")

  val frameDedupSql: String = s"""
    WITH inv AS ($multimodalFramesSql)
    SELECT frame_sha, COUNT(*) AS n_occ,
      COUNT(DISTINCT doc_id) AS n_payloads,
      CAST(MAX(frame_len) AS BIGINT) AS frame_len,
      MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM inv GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY 1"""
}
