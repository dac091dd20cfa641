package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Export sinks (SURVEY.md §2 E) — the Spark-first analog of the reference's
  * Google-Sheets report export (/root/reference/app/db/sheets_sync.py) plus
  * the partitioned lake write its BigQuery tables imply.
  *
  * Scale notes: `csvReport` coalesces to ONE file because it models a small
  * aggregated report (the Sheets use case) — never call it on a fact table;
  * `partitionedParquet` is the fact-table path: partition pruning on the
  * given columns is what makes later incremental reads (A6) cheap.
  */
object Export {

  /** Small aggregated report → a single headered CSV (Sheets analog). */
  def csvReport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** Line-delimited JSON export. */
  def jsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Fact-table write partitioned by low-cardinality columns, so downstream
    * date/type-bounded reads prune whole directories. */
  def partitionedParquet(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed catalog table — pre-shuffled on the join key at write time so
    * repeated key joins/aggregations between tables bucketed the same way
    * run WITHOUT a shuffle (Spark reads bucket files as pre-partitioned,
    * SortMergeJoin gets Exchange-free inputs). This is the 100 TB answer to
    * "the same fact-fact join runs every day": pay the shuffle once at load,
    * never at query time. Requires `saveAsTable` (bucket metadata lives in
    * the catalog). */
  def bucketedTable(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
