package graft.materialize

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

import graft.CheckpointRow

/** Checkpoint table: per-partition lineage + resume marker
  * (SURVEY.md §7.2 #8, FIXTURES.md §6).
  *
  * Spark analog of the reference's batch-acknowledgement protocol — a batch
  * is acknowledged only after it has been received
  * (/root/reference/src/sharding.rs:270-271, ack of `lastBatch` while
  * requesting the next): here a partition's checkpoint row is appended only
  * *after* its data files are durably written, so a missing row always means
  * "not done" and resume recomputes exactly the pending partitions.
  */
object Checkpoint {

  def read(spark: SparkSession, path: String): Dataset[CheckpointRow] = {
    import spark.implicits._
    if (Files.exists(Paths.get(path)) &&
        Files.list(Paths.get(path)).findFirst().isPresent)
      spark.read.parquet(path).as[CheckpointRow]
    else spark.emptyDataset[CheckpointRow]
  }

  def append(spark: SparkSession, path: String,
             rows: Seq[CheckpointRow]): Unit = {
    import spark.implicits._
    spark.createDataset(rows).coalesce(1)
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Partitions of `stage` already completed for `runId` AND the same
    * input snapshot — an ack against a different input is stale (the
    * reference's cursor is likewise bound to one dump context,
    * /root/reference/src/sharding.rs:86-137).
    */
  def doneParts(spark: SparkSession, path: String, runId: String,
                stage: String, inputTag: String): Set[Int] = {
    import spark.implicits._
    read(spark, path)
      .filter(r => r.run_id == runId && r.stage == stage &&
        r.status == "done" && r.input_tag == inputTag)
      .map(_.part)
      .collect()
      .toSet
  }
}
