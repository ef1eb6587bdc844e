package graft.materialize

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, SparkSession}

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
  *
  * Storage is a single JSONL log file appended driver-side (checkpoint rows
  * are tiny and bounded by stages × buckets): a long run with many commit
  * groups and retries grows ONE file, not an unbounded pile of one-row
  * parquet part files. A crash mid-append can leave at most one torn final
  * line; the reader drops lines that fail to parse, and a torn ack row
  * degrades to "not done" — the safe direction.
  */
object Checkpoint {

  private def logFile(path: String): Path = Paths.get(path, "checkpoint.jsonl")

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def toJson(r: CheckpointRow): String =
    s"""{"run_id":"${esc(r.run_id)}","stage":"${esc(r.stage)}","part":${r.part},""" +
      s""""input_tag":"${esc(r.input_tag)}","input_fingerprint":"${esc(r.input_fingerprint)}",""" +
      s""""rows_in":${r.rows_in},"rows_out":${r.rows_out},"wall_ms":${r.wall_ms},""" +
      s""""status":"${esc(r.status)}"}"""

  private val LineRe =
    ("""\{"run_id":"((?:[^"\\]|\\.)*)","stage":"((?:[^"\\]|\\.)*)","part":(-?\d+),""" +
      """"input_tag":"((?:[^"\\]|\\.)*)","input_fingerprint":"((?:[^"\\]|\\.)*)",""" +
      """"rows_in":(-?\d+),"rows_out":(-?\d+),"wall_ms":(-?\d+),""" +
      """"status":"((?:[^"\\]|\\.)*)"\}""").r

  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case e => b.append(e); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def parse(line: String): Option[CheckpointRow] = line match {
    case LineRe(runId, stage, part, tag, fp, rin, rout, ms, status) =>
      Some(CheckpointRow(unesc(runId), unesc(stage), part.toInt, unesc(tag),
        unesc(fp), rin.toLong, rout.toLong, ms.toLong, unesc(status)))
    case _ => None // torn/foreign line: treat as absent (= not done)
  }

  /** All rows driver-side (bounded: stages × buckets × retries, tiny). */
  def readRows(path: String): Seq[CheckpointRow] = {
    val f = logFile(path)
    if (!Files.exists(f)) Seq.empty
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .flatMap(parse)
  }

  def read(spark: SparkSession, path: String): Dataset[CheckpointRow] = {
    import spark.implicits._
    spark.createDataset(readRows(path))
  }

  def append(spark: SparkSession, path: String,
             rows: Seq[CheckpointRow]): Unit = {
    Files.createDirectories(Paths.get(path))
    val f = logFile(path)
    // A crash can leave a torn (newline-less) tail; start on a fresh line so
    // the first post-crash append isn't concatenated into the torn garbage.
    // O(1): read only the final byte, not the whole log.
    val needsNl = Files.exists(f) && Files.size(f) > 0 && {
      val ch = Files.newByteChannel(f, StandardOpenOption.READ)
      try {
        ch.position(ch.size() - 1)
        val buf = java.nio.ByteBuffer.allocate(1)
        ch.read(buf)
        buf.get(0) != '\n'.toByte
      } finally ch.close()
    }
    val payload = rows.map(toJson).mkString(if (needsNl) "\n" else "", "\n", "\n")
    Files.write(f, payload.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND,
      StandardOpenOption.SYNC) // ack must be durable before we report done
  }

  /** Partitions of `stage` already completed for `runId` AND the same
    * input snapshot — an ack against a different input is stale (the
    * reference's cursor is likewise bound to one dump context,
    * /root/reference/src/sharding.rs:86-137).
    */
  def doneParts(spark: SparkSession, path: String, runId: String,
                stage: String, inputTag: String): Set[Int] =
    readRows(path)
      .filter(r => r.run_id == runId && r.stage == stage &&
        r.status == "done" && r.input_tag == inputTag)
      .map(_.part)
      .toSet
}
