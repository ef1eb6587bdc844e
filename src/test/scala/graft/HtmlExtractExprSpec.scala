package graft

import org.apache.spark.sql.functions._

import graft.extract.HtmlText
import graft.functions.HtmlExtractExpr
import graft.functions.HtmlExtractExpr.html_extract
import graft.synth.PageSynth

/** Native html_extract expression: interpreted/codegen parity with the pure
  * function, null handling, SQL registration.
  */
class HtmlExtractExprSpec extends SparkSpec {

  test("expression output equals the pure function on synthesized pages") {
    import spark.implicits._
    val pages = PageSynth.pages(spark, 42L, 200L, 4)
    val viaExpr = pages.toDF
      .select(col("url"), html_extract(col("html")).as("t"))
      .as[(String, String)].collect().toMap
    val expected = (0L until 200L).map { i =>
      val p = PageSynth.page(42L, i)
      p.url -> HtmlText.extract(p.html)
    }.toMap
    assert(viaExpr == expected)
  }

  test("null input yields null; empty bytes yield empty string") {
    import spark.implicits._
    val df = Seq((1, Option.empty[Array[Byte]]),
      (2, Some(Array.emptyByteArray))).toDF("id", "html")
    val out = df.select(col("id"), html_extract(col("html")).as("t"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(out(1).isEmpty)
    assert(out(2).contains(""))
  }

  test("registered SQL function works") {
    import spark.implicits._
    HtmlExtractExpr.register(spark)
    Seq(("<p>a&amp;b</p>".getBytes("UTF-8"), 1)).toDF("html", "id")
      .createOrReplaceTempView("html_t")
    val got = spark.sql("SELECT html_extract(html) AS t FROM html_t")
      .collect().head.getString(0)
    assert(got == "a&b")
  }

  test("type mismatch is rejected at analysis") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(1).toDF("x").select(html_extract(col("x"))).collect()
    }
    assert(err.getMessage.contains("BINARY") ||
      err.getMessage.toLowerCase.contains("type"))
  }
}
