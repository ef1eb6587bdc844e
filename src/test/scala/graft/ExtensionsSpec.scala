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
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ graft.plans.SimplifyOpenSchemaProjection
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

  test("SimplifyOpenSchemaProjection folds props['k'] round-trips to the bare column") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Parquet-backed input: local literal relations would constant-fold via
    // ConvertToLocalRelation regardless of the rule and prove nothing.
    def roundTrip(s: org.apache.spark.sql.SparkSession) = {
      val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      graft.ops.OpenSchema.allAttributes(docs, "doc_id")
        .select(col("doc_id"), graft.ops.OpenSchema.prop("lang"),
          graft.ops.OpenSchema.prop("n_chars", "long"))
    }
    val folded = roundTrip(spark)
    val optimized = folded.queryExecution.optimizedPlan.toString
    // The per-row map build + filter must be gone entirely.
    assert(!optimized.contains("map_filter") && !optimized.contains("map("),
      s"open-schema round-trip not folded:\n$optimized")
    // Results identical to the direct projection.
    val got = folded.as[(Long, String, Long)].collect().toSet
    val want = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // Same query WITHOUT the rule keeps the map build (proves the built-ins
    // alone don't fold it — the rule earns its place). The base session now
    // carries GraftExtensions too, so the control excludes the rule by name.
    val plainPlan = try {
      SparkSpec.session.conf.set("spark.sql.optimizer.excludedRules",
        "graft.plans.SimplifyOpenSchemaProjection")
      roundTrip(SparkSpec.session).queryExecution.optimizedPlan.toString
    } finally SparkSpec.session.conf.unset("spark.sql.optimizer.excludedRules")
    assert(plainPlan.contains("map_filter"), plainPlan)
  }

  test("SimplifyOpenSchemaProjection leaves non-deterministic map values alone") {
    import org.apache.spark.sql.functions._
    // The fold duplicates the entry's value expression into predicate and
    // result — for rand() that would mean two different draws per row,
    // diverging from map_filter's build-once semantics. The rule must not
    // fire (round-2 ADVICE low #5).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(col("doc_id"),
      map_filter(map(lit("a"), rand()), (_, v) => v > lit(0.5))
        .getItem("a").as("x"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("map_filter"),
      s"rule illegally folded a non-deterministic map value:\n$optimized")
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
