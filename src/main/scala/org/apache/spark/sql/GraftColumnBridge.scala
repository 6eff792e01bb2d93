package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Catalyst-Expression bridge.
  *
  * Spark 4's `Column` wraps a ColumnNode and the classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`,
  * so an extension library that wants to hand out a native Expression
  * as a plain `Column` — WITHOUT requiring the session to have its
  * function registry populated first — needs this one-hop bridge in the
  * `org.apache.spark.sql` package. The standard pattern of public Spark
  * extension libraries (Sedona, frameless, Deequ all ship one).
  *
  * graft uses it for expressions that back registration-free Column
  * APIs (e.g. [[graft.operators.UrlOps.canon]]'s percent-encoding
  * normalization): query faces still register everything via
  * GraftFunctions.register for the SQL surface, but a bare
  * `UrlOps.canon(col("url"))` must keep working on any session.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
