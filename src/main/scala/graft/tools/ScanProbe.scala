package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.{Pipeline, PipelineConfig}
import graft.synth.PageSynth
import graft.triples.TripleExtract

/** Scaling probe: isolates the narrow scan+extract stage to locate
  * anti-scaling (dev tool, not part of the driver contract).
  */
object ScanProbe {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nPages = 100000L
    val dir = Files.createTempDirectory("graft-probe").toString
    val prep = session(32)
    val table = Pipeline.buildPagesTable(prep, PipelineConfig(seed = 42L,
      nPages = nPages, partitions = 64, outputBuckets = 32, workDir = dir,
      sentMin = 24, sentSpread = 16))
    prep.stop()

    Seq(2, 8, 2, 8, 32, 32).foreach { cpus =>
      val spark = session(cpus)
      val taskTimes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            taskTimes.add(te.taskInfo.duration)
        })
      val pages = Pipeline.readPagesForExtraction(spark, table)
      val raw = TripleExtract.extractDirect(pages, PageSynth.aliasDictionary,
        PageSynth.relations.toMap)
      // warm
      raw.limit(1).count()
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      val g0 = gcMs
      val comp = java.lang.management.ManagementFactory.getCompilationMXBean
      val c0 = comp.getTotalCompilationTime
      taskTimes.clear()
      val t0 = System.nanoTime()
      val n = raw.count()
      import scala.jdk.CollectionConverters._
      val tt = taskTimes.asScala.toSeq.sorted
      val stats = if (tt.nonEmpty)
        f"tasks=${tt.size} med=${tt(tt.size / 2)} max=${tt.last} ms" else ""
      println(f"[probe] cpus=$cpus%2d scan+extract count=$n ${(System.nanoTime() - t0) / 1e9}%.2f s gc=${gcMs - g0} ms jit=${comp.getTotalCompilationTime - c0} ms $stats")
      val t1 = System.nanoTime()
      val n2 = pages.count()
      println(f"[probe] cpus=$cpus%2d read-only count=$n2 ${(System.nanoTime() - t1) / 1e9}%.2f s")
      spark.stop()
    }
  }
}
