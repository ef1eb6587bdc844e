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

  /** One idempotent micro-batch append into the bucketed Icebergish triple
    * table: skip if this batchId is already acked (a foreachBatch may
    * replay after a crash between our commit and the streaming engine's),
    * otherwise dedup within the batch in one bucket exchange, append the
    * files (committer-atomic), commit a snapshot, THEN ack the batch.
    */
  def appendBatch(batch: DataFrame, table: String, batchId: Long,
                  numParts: Int): Unit = {
    val ackPath = s"$table-acks"
    val already = graft.materialize.Checkpoint.readRows(ackPath)
      .exists(r => r.run_id == "stream" && r.stage == "append" &&
        r.part == batchId.toInt && r.status == "done")
    if (already || batch.isEmpty) return
    val withPart = batch.withColumn(graft.io.IcebergishTable.PartCol,
      graft.io.IcebergishTable.partExpr("subj", numParts))
    val deduped = graft.materialize.GraphOut
      .bucketedDedupPlan(withPart, numParts * 2,
        Seq("subj", "pred", "obj", "url"))
    graft.io.IcebergishTable.appendPrePartitioned(deduped, table, numParts, "subj")
    val n = graft.io.IcebergishTable.read(batch.sparkSession, table).count()
    graft.materialize.Checkpoint.append(batch.sparkSession, ackPath, Seq(
      graft.CheckpointRow("stream", "append", batchId.toInt, "stream",
        "-", n, n, 0L, "done")))
  }

  /** Incremental KG straight into the BUCKETED Icebergish edge table —
    * the production sink shape: streaming-checkpoint replay × per-batch
    * ack log gives exactly-once at batch granularity, and the output is
    * the same snapshot/manifest table format the batch pipeline writes
    * (time-travel, bucket layout, DSv2 catalog all apply).
    */
  def buildIncrementalBucketed(spark: SparkSession, pagesDataDir: String,
                               table: String, checkpointDir: String,
                               canon: Map[String, String],
                               numParts: Int = 16): DataFrame = {
    val q = triplesStream(spark, pagesDataDir, canon).toDF
      .writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        appendBatch(batch, table, batchId, numParts))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.io.IcebergishTable.read(spark, table)
  }
}
