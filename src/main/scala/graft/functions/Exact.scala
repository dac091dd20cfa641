package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exact arithmetic helpers shared by every money/ratio query.
  *
  * The correctness gate hash-compares our parquet against a DuckDB oracle,
  * so floating-point aggregates must be *bit-identical* across engines.
  * Doubles summed in shuffle order are not reproducible, so all monetary
  * math is done in integer cents (exact, associative, order-independent)
  * with a single final division back to double. The oracle SQL mirrors the
  * same integer pipeline, making both sides exact — see SURVEY.md §3.
  *
  * This is also the right call at 100 TB: long sums are cheaper than
  * decimal sums and keep partial aggregation (map-side combine) exact.
  */
object Exact {
  /** Double with 2-decimal origin -> integer cents (exact). */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Integer cents sum -> double units. Single division keeps exactness. */
  def centsToUnits(sumCents: Column): Column =
    sumCents.cast("double") / lit(100.0)

  /** price*(1-disc) summed exactly: centsPrice * (100 - pctDisc) / 1e4. */
  def discounted(priceCents: Column, discPct: Column): Column =
    priceCents * (lit(100) - discPct)

  /** price*(1-disc)*(1+tax) in integer micro-units (divide by 1e6). */
  def charged(priceCents: Column, discPct: Column, taxPct: Column): Column =
    priceCents * (lit(100) - discPct) * (lit(100) + taxPct)

  /** Exact mean of a cents column as double: sum/count/100. */
  def avgFromCents(sumCents: Column, n: Column): Column =
    sumCents.cast("double") / n.cast("double") / lit(100.0)
}
