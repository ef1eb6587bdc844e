package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Page

/** JSONL page source — the reference's wire format (dump strategy streams
  * JSONL batches, one doc per line, /root/reference/src/graph_loader.rs:421)
  * as a Spark file source, with the reference's row validation (F1: rows
  * missing required string fields hard-fail the load,
  * /root/reference/src/graph_loader.rs:432-446) expressed as PERMISSIVE
  * parsing + an explicit corrupt/invalid side-channel instead of
  * fail-the-world.
  */
object JsonlPages {

  /** Page schema on the wire: html is base64 (JSON has no binary). */
  val wireSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html_b64", StringType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("_corrupt", StringType)
  ))

  /** Read a JSONL directory/file into (valid pages, rejected lines).
    * Valid = parseable AND url/html present (the reference's `_id`
    * requirement). Rejects carry the raw line for quarantine.
    */
  def read(spark: SparkSession, path: String): (Dataset[Page], DataFrame) = {
    import spark.implicits._
    val raw = spark.read
      .schema(wireSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .cache()
    val valid = raw
      .where(col("_corrupt").isNull &&
        col("url").isNotNull && col("html_b64").isNotNull)
      .select(col("url"), col("warc_ts"),
        unbase64(col("html_b64")).as("html"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("lang"), lit("und")).as("lang"))
      .as[Page]
    val rejected = raw
      .where(col("_corrupt").isNotNull ||
        col("url").isNull || col("html_b64").isNull)
      .select(col("_corrupt").as("raw_line"), col("url"))
    (valid, rejected)
  }

  /** Write pages as JSONL (html base64-encoded) — round-trip counterpart. */
  def write(pages: Dataset[Page], path: String): Unit =
    pages.toDF
      .select(col("url"), col("warc_ts"),
        base64(col("html")).as("html_b64"), col("text"), col("lang"))
      .write.mode("overwrite").json(path)
}
