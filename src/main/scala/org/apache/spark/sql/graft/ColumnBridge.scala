package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one `private[sql]` doorway the engine needs: wrapping a custom
  * Catalyst expression that carries a BOUND runtime object (the built Bloom
  * filter of [[graft.functions.BloomHitExpr]]) into a `Column`. Every other
  * kernel goes through the function registry, but registry factories only
  * receive child expressions — they cannot close over a per-query model —
  * so this is the standard extension-package idiom for model-bound
  * expressions (the same device Spark's own ML pipelines use via
  * `SparkUserDefinedFunction`, minus the UDF's codegen opacity). Kept to a
  * two-method bridge so the `org.apache.spark` package intrusion stays
  * auditable. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
