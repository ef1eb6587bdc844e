package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Deduplicate
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions wiring: injected SQL function + optimizer rule.
  * Uses its own session (extensions bind at session build time).
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // Extensions normally bind at session construction (spark-submit:
    // --conf spark.sql.extensions=graft.plans.GraftExtensions). In-process
    // with a pre-existing session, attach the same pieces through the
    // runtime hooks: experimental.extraOptimizations + function registry.
    val s = SparkSpec.session.newSession()
    graft.functions.HtmlExtractExpr.register(s)
    s
  }

  test("GraftExtensions applies cleanly to a SparkSessionExtensions instance") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must not throw
  }

  test("injected html_extract works in SQL") {
    import spark.implicits._
    Seq((1, "<p>x &amp; y</p>".getBytes("UTF-8"))).toDF("id", "html")
      .createOrReplaceTempView("ext_html")
    // note: newSession drops temp views of other sessions; re-register here
    val got = spark.sql("SELECT html_extract(html) FROM ext_html")
      .collect().head.getString(0)
    assert(got == "x & y")
  }

  test("Catalyst built-ins already collapse redundant nested dedup (why we ship no custom rule)") {
    import spark.implicits._
    val df = Seq(("a", "x", 1), ("a", "x", 2), ("b", "y", 3))
      .toDF("k1", "k2", "v")
    val nested = df.dropDuplicates(Seq("k1", "k2"))
      .dropDuplicates(Seq("k1", "k2", "v")) // superset of inner keys → no-op
    val optimized = nested.queryExecution.optimizedPlan
    // Spark replaces Deduplicate with Aggregate and collapses the pair
    // into a single Aggregate — one shuffle, not two.
    val dedups = optimized.collect { case d: Deduplicate => d }
    val aggs = optimized.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(dedups.isEmpty && aggs.size == 1,
      s"expected a single collapsed Aggregate:\n$optimized")
    assert(nested.count() == 2)
  }
}
