package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Page, Triple}
import graft.functions.HtmlExtractExpr.html_extract
import graft.synth.PageSynth
import graft.triples.TripleExtract

/** Incremental KG construction: the batch pipeline's narrow scan pass is
  * purely row-local, so it lifts unchanged onto Structured Streaming —
  * new page files appearing under the table become triples exactly as in
  * batch, with the file-source checkpoint supplying exactly-once progress
  * (the streaming twin of the reference's batch-ack cursor,
  * /root/reference/src/sharding.rs:237-271).
  */
object StreamingKg {

  /** Streaming triples from a pages directory (parquet files appear over
    * time). Canonicalization of the dictionary-derived sameAs graph is a
    * static broadcast map, applied inline.
    */
  def triplesStream(spark: SparkSession, pagesDataDir: String,
                    canon: Map[String, String]): Dataset[Triple] = {
    import spark.implicits._
    val schema = spark.read.parquet(pagesDataDir).schema
    val pages = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(pagesDataDir)
      .select(col("url"), col("warc_ts"), col("html"),
        html_extract(col("html")).as("text"), col("lang"))
      .as[Page]
    val canonB = spark.sparkContext.broadcast(canon)
    val raw = TripleExtract.extractDirect(pages, PageSynth.aliasDictionary,
      PageSynth.relations.toMap)
    raw.map { t =>
      val c = canonB.value
      t.copy(subj = c.getOrElse(t.subj, t.subj),
        obj = c.getOrElse(t.obj, t.obj))
    }
  }

  /** Run the stream until all currently-available files are processed,
    * appending to a parquet triple table with a durable checkpoint; returns
    * the materialized triples. Re-invoking after new files land processes
    * ONLY the new files (file-source exactly-once resume).
    */
  def buildIncremental(spark: SparkSession, pagesDataDir: String,
                       outDir: String, checkpointDir: String,
                       canon: Map[String, String]): DataFrame = {
    val q = triplesStream(spark, pagesDataDir, canon).toDF
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }
}
