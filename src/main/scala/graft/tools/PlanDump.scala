package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of SparkEntry queries to files (dev tool —
  * the optimization-round plan-evidence generator).
  *
  * usage: runMain graft.tools.PlanDump <outDir> <suffix> [query...]
  * (no query names = the Bench headline set). Writes
  * `<outDir>/<query>_<suffix>.txt` per query, using the same session
  * configuration as Bench so the plans match what the bench runs.
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args.length > 2) args.drop(2).toSeq
      else Seq(
        "q_agg_group", "q_join_broadcast", "q_join_sortmerge", "q_window_topk",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "ann_brute_topk", "text_quality", "text_fingerprint",
        "kg_triples", "kg_edges", "q_skew_plain", "q_skew_salted")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          val plan =
            try fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
          Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
