/*
 * Lives in org.apache.spark.sql solely to reach two private[sql] surfaces:
 * the classic ExpressionUtils converter (Column → catalyst Expression) and
 * the sql.internal ColumnNode tree behind Spark 4's Column facade — both
 * needed by manifest zone-map pruning to analyze a caller's predicate
 * Column without forcing resolution. Everything used here is Apache Spark
 * public source.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {

  /** Catalyst expression behind a (classic-session) Column. */
  def expressionOf(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Column wrapping a catalyst expression (the inverse direction). */
  def columnOf(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** DataFrame over a logical plan (classic Dataset.ofRows is
    * private[sql]) — the SQL row-level commands need to evaluate a MERGE
    * source plan as a frame.
    */
  def dfOf(spark: SparkSession,
           plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Neutral view of a Column's node tree: function calls over attributes
    * and external-valued literals; anything else is opaque (consumers must
    * treat it conservatively).
    */
  sealed trait PredNode
  final case class PCall(name: String, args: Seq[PredNode]) extends PredNode
  final case class PAttr(name: String) extends PredNode
  final case class PLit(value: Any) extends PredNode
  case object POpaque extends PredNode

  def predTreeOf(c: Column): PredNode = lower(c.node)

  private def lower(n: internal.ColumnNode): PredNode = n match {
    case f: internal.UnresolvedFunction =>
      PCall(f.functionName, f.arguments.map(lower))
    case a: internal.UnresolvedAttribute if a.nameParts.length == 1 =>
      PAttr(a.nameParts.head)
    case l: internal.Literal => PLit(l.value)
    case _ => POpaque
  }
}
