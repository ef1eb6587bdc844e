package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.{Pipeline, PipelineConfig}

/** Per-stage scaling decomposition (dev tool): one fresh JVM per level via
  * Bench child-mode is ideal; this in-process variant is for quick reads.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "600000").toLong
    def session(cpus: Int) = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val prep = session(32)
    prep.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft-sp").toString
    val table = Pipeline.buildPagesTable(prep, PipelineConfig(seed = 42L,
      nPages = nPages, partitions = 64, outputBuckets = 128, workDir = dir,
      sentMin = 24, sentSpread = 16))
    prep.stop()
    val levels = sys.env.getOrElse("SPARK_GRAFT_PROBE_LEVELS", "2,2,8,8,32,32")
      .split(',').map(_.trim.toInt).toSeq
    levels.foreach { cpus =>
      val spark = session(cpus)
      spark.sparkContext.setLogLevel("ERROR")
      val out = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-sp-out").toString
      Files.createSymbolicLink(java.nio.file.Paths.get(s"$out/pages"),
        java.nio.file.Paths.get(table))
      val t0 = System.nanoTime()
      // sentMin/sentSpread must match the prep config or the synth-config
      // fingerprint check would rebuild the shared table.
      val buckets = sys.env.getOrElse("SPARK_GRAFT_PROBE_BUCKETS", "32").toInt
      Pipeline.build(spark, PipelineConfig(seed = 42L, nPages = nPages,
        partitions = cpus * 2, outputBuckets = buckets, workDir = out,
        runId = s"sp-$cpus-${System.nanoTime()}", sentMin = 24, sentSpread = 16))
      println(f"[stage] cpus=$cpus total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.io.IcebergishTable.drop(out)
      spark.stop()
    }
  }
}
