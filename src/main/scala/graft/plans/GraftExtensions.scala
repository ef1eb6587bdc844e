package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.HtmlExtractExpr

/** Session-extension entry point: registers the engine's native
  * function(s). Usage:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Deliberately ships NO custom optimizer rule or SparkStrategy
  * (SURVEY.md §4/§7.4): the shapes this engine produces are fully
  * optimized by Catalyst's built-ins — e.g. redundant nested dedups are
  * collapsed by the Deduplicate→Aggregate replacement + aggregate
  * collapse, asserted in ExtensionsSpec. Adding a rule Spark subsumes
  * would be maintenance surface with zero plan benefit.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("html_extract"),
      new ExpressionInfo(classOf[HtmlExtractExpr].getName, "html_extract"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HtmlExtractExpr(exprs.head)
    ))
  }
}
