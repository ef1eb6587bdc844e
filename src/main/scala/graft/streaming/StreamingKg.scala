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

  /** One exactly-once micro-batch append into the bucketed Icebergish
    * triple table. Two-phase ack around the append closes BOTH crash
    * windows of a replayed foreachBatch:
    *
    *   1. "pending" ack records the pre-append snapshot, THEN the batch's
    *      deduped rows are appended (committer-atomic) and a new snapshot
    *      committed, THEN the "done" ack lands.
    *   2. On replay: done → no-op. Pending-without-done → the previous
    *      attempt may have appended before crashing; roll the table back
    *      to the recorded snapshot (delete files outside its manifest) and
    *      redo. No ack at all → nothing was written; just run.
    *
    * Batch ids ride in `input_tag` (a Long — `part` is an Int bucket index
    * and would truncate). Lineage counts are the BATCH's own deduped rows,
    * not a whole-table rescan.
    */
  def appendBatch(batch: DataFrame, table: String, batchId: Long,
                  numParts: Int): Unit = {
    import graft.io.IcebergishTable
    import graft.materialize.{Checkpoint, GraphOut}
    val spark = batch.sparkSession
    val ackPath = s"$table-acks"
    val tag = s"batch-$batchId"
    val acks = Checkpoint.readRows(ackPath)
      .filter(r => r.run_id == "stream" && r.stage == "append" &&
        r.input_tag == tag)
    if (acks.exists(_.status == "done")) return
    acks.filter(_.status == "pending").lastOption.foreach { p =>
      // Previous attempt crashed after possibly appending: undo it
      // UNCONDITIONALLY. Gating on currentSnapshot > snap would miss the
      // window where the parquet job committed its files into the bucket
      // dirs but the manifest/VERSION swap never ran (currentSnapshot still
      // == snap, orphan files on disk) — the redo would then append the
      // batch twice and the next directory-derived manifest would include
      // both attempts' files. rollbackTo is idempotent: it deletes exactly
      // the live files outside `snap`'s manifest (a no-op when the crashed
      // attempt wrote nothing) and restores VERSION. A pre-append snapshot
      // of -1 means the crashed attempt CREATED the table — undo is
      // dropping the directory entirely (including uncommitted orphans).
      val snap = p.input_fingerprint.toInt
      if (snap >= 0) IcebergishTable.rollbackTo(table, snap)
      else IcebergishTable.drop(table)
    }
    if (batch.isEmpty) {
      Checkpoint.append(spark, ackPath, Seq(graft.CheckpointRow(
        "stream", "append", 0, tag, "-", 0L, 0L, 0L, "done")))
      return
    }
    val preSnapshot = IcebergishTable.currentSnapshot(table)
    Checkpoint.append(spark, ackPath, Seq(graft.CheckpointRow(
      "stream", "append", 0, tag, preSnapshot.toString, 0L, 0L, 0L,
      "pending")))
    val withPart = batch.withColumn(IcebergishTable.PartCol,
      IcebergishTable.partExpr("subj", numParts))
    val deduped = GraphOut.bucketedDedupPlanAligned(withPart, numParts,
      "subj", Seq("subj", "pred", "obj", "url"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // CROSS-BATCH dedup (late-data semantics): a page re-delivered in a
    // later micro-batch — a duplicated input file, an upstream retry —
    // re-emits triples an earlier batch already committed, and the
    // in-batch dedup cannot see them. Anti-join the batch against the
    // table's CURRENT committed state on the dedup key, reading ONLY the
    // buckets this batch touches (both sides are bucketed on subj, and the
    // batch's bucket list is bounded by numParts). The incremental build
    // therefore converges to the batch build's table for ANY partitioning,
    // ordering, or duplication of the same logical pages.
    val fresh = (
      if (!IcebergishTable.exists(table)) deduped
      else {
        val batchParts = deduped
          .select(col(IcebergishTable.PartCol)).distinct()
          .collect().map(_.getInt(0)).toSeq
        val existing = IcebergishTable.read(spark, table)
          .where(col(IcebergishTable.PartCol).isin(batchParts: _*))
          .select("subj", "pred", "obj", "url")
        deduped.join(existing, Seq("subj", "pred", "obj", "url"), "left_anti")
          .repartition(numParts, col("subj")) // restore bucket alignment
      }
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = fresh.count() // this batch's rows, not a whole-table rescan
    if (n > 0)
      IcebergishTable.appendPrePartitioned(fresh, table, numParts, "subj")
    fresh.unpersist(blocking = false)
    deduped.unpersist(blocking = false)
    Checkpoint.append(spark, ackPath, Seq(graft.CheckpointRow(
      "stream", "append", 0, tag, preSnapshot.toString, n, n, 0L, "done")))
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
