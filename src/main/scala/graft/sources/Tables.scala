package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-stable loaders for the engine's table universe.
  *
  * Mirrors the reference's entity model (clients/products/documents/details,
  * /root/reference/app/db/bigquery_client.py:100-137) mapped onto the
  * driver's TPC-H-ish star schema plus the LLM-pipeline corpus tables.
  *
  * Scale note: these are plain parquet scans so Catalyst can push filters
  * and prune columns into the scan; callers should filter/select straight
  * off the returned DataFrame (never cache the raw scan) so PushedFilters /
  * ReadSchema stay minimal at 100 TB.
  */
object Tables {
  val fact: Seq[String] = Seq("orders", "lineitem", "events")
  val dims: Seq[String] = Seq("region", "nation", "customer", "supplier", "part")
  val corpus: Seq[String] = Seq("documents", "embeddings")
  val all: Seq[String] = dims ++ fact ++ corpus

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)    = load(s, d, "region")
  def nation(s: SparkSession, d: String)    = load(s, d, "nation")
  def customer(s: SparkSession, d: String)  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = load(s, d, "supplier")
  def part(s: SparkSession, d: String)      = load(s, d, "part")
  def orders(s: SparkSession, d: String)    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read it as a raw nanos long (legacy conf) and keep event-time math in
    * integer nanoseconds — exact, order-independent, and cheaper than
    * timestamp codecs in a 100 TB event scan. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String) = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")

  /** ORC read — the scan-side twin of [[Export.orc]]. Plain `spark.read`
    * so Catalyst pushes filters and prunes columns into the ORC reader
    * exactly as it does for parquet (PushedFilters/ReadSchema verified in
    * the roundtrip spec). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-drift-tolerant parquet read: conform files written under
    * EVOLVING schemas (new columns added, old ones retired, files reordered)
    * to one canonical schema — the read side of the lake chore `compact` is
    * the write side of. Per canonical column: present in the file → cast to
    * the canonical type; absent → NULL of that type. Extra file columns are
    * dropped by the projection.
    *
    * Scale: `mergeSchema` footer-merges ALL files (a parallel job, but
    * still O(files) work) — at true lake scale a catalog (Delta/Iceberg)
    * tracks the schema instead and this read drops the option; the conform
    * projection is the part that stays. It is a narrow codegen'd Project
    * that fuses into the scan, and column pruning still reaches the reader
    * because the projection is per-column. */
  def readParquetEvolved(s: SparkSession,
                         schema: org.apache.spark.sql.types.StructType,
                         paths: String*): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // one read over all paths; files missing a sampled column yield NULLs
    val raw = s.read.option("mergeSchema", "true").parquet(paths: _*)
    val have = raw.schema.fieldNames.toSet
    raw.select(schema.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Headered CSV with an EXPLICIT schema — never schema inference, which
    * costs a full extra pass over the data at 100 TB and guesses types. */
  def readCsv(s: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  /** Line-delimited JSON with an explicit schema (same inference caveat). */
  def readJsonLines(s: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).json(path)
}
