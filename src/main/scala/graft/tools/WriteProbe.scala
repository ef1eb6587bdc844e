package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Pipeline
import graft.synth.PageSynth
import graft.triples.TripleExtract

/** Edges-stage cost decomposition (dev tool): times the salted
  * single-exchange dedup plan with a noop sink (map + shuffle + aggregate
  * only) against the same plan written as partitioned parquet — the
  * difference is the parquet-writer share of the reduce stage.
  *
  * usage: runMain graft.tools.WriteProbe <pagesTableDir> [reps]
  */
object WriteProbe {

  def main(args: Array[String]): Unit = {
    val table = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-write-probe")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pages = Pipeline.readPagesForExtraction(spark, table)
    val raw = TripleExtract.extractDirect(pages, PageSynth.aliasDictionary,
      PageSynth.relations.toMap).toDF
    val withPart = raw.withColumn(graft.io.IcebergishTable.PartCol,
      graft.io.IcebergishTable.partExpr("subj", 32))
    def plan = graft.materialize.GraphOut
      .bucketedDedupPlanAlignedSalted(withPart, 32,
        Seq("subj", "pred", "obj", "url"), 4)

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[wp] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    timed("warm-noop")(
      plan.write.format("noop").mode("overwrite").save())
    (1 to reps).foreach { _ =>
      timed("noop   ")(plan.write.format("noop").mode("overwrite").save())
      val dir = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "wp").toString
      timed("parquet")(plan.write.mode("overwrite")
        .partitionBy(graft.io.IcebergishTable.PartCol).parquet(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    spark.stop()
  }
}
