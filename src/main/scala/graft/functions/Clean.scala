package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String cleansing + format validators, re-expressing the reference's
  * row-validation layer (/root/reference/app/services/etl_service.py:20-222)
  * as codegen-friendly column expressions (no UDFs — these all stay inside
  * WholeStageCodegen, which matters in a 100 TB validation pass).
  */
object Clean {
  /** Junk string literals the reference treats as missing
    * (etl_service.py:30, 70, 75). */
  val junkLiterals: Seq[String] = Seq("", "null", "none", "sin nombre")

  /** trim + junk-literal -> NULL normalization. */
  def normStr(c: Column): Column = {
    val t = trim(c)
    when(lower(t).isin(junkLiterals: _*), lit(null)).otherwise(t)
  }

  /** Chilean RUT format check — permissive, mirrors
    * etl_service.py:204-215 (`^[0-9]{7,8}-?[0-9kK]?$` after stripping
    * dots/spaces). */
  def rutValid(c: Column): Column =
    regexp_replace(regexp_replace(trim(c), lit("\\."), lit("")), lit(" "), lit(""))
      .rlike("^[0-9]{7,8}-?[0-9kK]?$")

  /** Basic email format check — mirrors etl_service.py:217-222. */
  def emailValid(c: Column): Column = trim(c).rlike("^[^@]+@[^@]+\\.[^@]+$")

  /** SQL twin fragments (DuckDB) for the oracle side. */
  def normStrSql(x: String): String =
    s"CASE WHEN lower(trim($x)) IN ('', 'null', 'none', 'sin nombre') THEN NULL ELSE trim($x) END"
  def rutValidSql(x: String): String =
    s"regexp_matches(replace(replace(trim($x), '.', ''), ' ', ''), '^[0-9]{7,8}-?[0-9kK]?$$')"
  def emailValidSql(x: String): String =
    s"regexp_matches(trim($x), '^[^@]+@[^@]+\\.[^@]+$$')"
}
