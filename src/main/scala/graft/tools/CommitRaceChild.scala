package graft.tools

import java.nio.file.{Files, Paths}

/** Cross-JVM commit-race harness child: loops `n` times copying a seed
  * parquet file into a bucket directory under a unique name and committing
  * it as an append delta. Two of these processes racing against one table
  * exercise the commit protocol's CREATE_NEW arbitration + parent re-merge
  * with NO shared JVM state — the filesystem is the only coordinator,
  * exactly the multi-writer situation a cluster produces. No SparkSession:
  * the commit path itself is pure metadata.
  *
  * args: table dir, child id, iterations, seed parquet file (absolute),
  * bucket id.
  */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(table, id, nStr, seedFile, bucketStr) = args.take(5)
    val n = nStr.toInt
    val bucket = bucketStr.toInt
    (0 until n).foreach { i =>
      val rel = s"data/part=$bucket/race-$id-$i.parquet"
      val dst = Paths.get(table, rel)
      Files.createDirectories(dst.getParent)
      Files.copy(Paths.get(seedFile), dst)
      graft.io.IcebergishTable.commitAddedFiles(table, Seq(rel))
    }
    println(s"CHILD-DONE $id")
  }
}
