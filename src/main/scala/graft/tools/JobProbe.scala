package graft.tools

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.{Pipeline, PipelineConfig}

/** Driver-serial-time probe (dev tool): runs one build with a listener
  * recording every job's wall span and task occupancy, then prints the
  * timeline INCLUDING the gaps between jobs — the gaps plus in-job idle
  * are exactly the non-scaling component that caps N→4N efficiency.
  */
object JobProbe {
  final case class JobSpan(id: Int, start: Long, var end: Long,
                           var tasks: Int, var runMs: Long,
                           var desc: String,
                           durs: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty,
                           var lastTaskEnd: Long = 0L)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "8").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "300000").toLong
    def session(c: Int) = SparkSession.builder()
      .master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", (c * 4).toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    val prep = session(32)
    prep.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft-jp").toString
    val table = Pipeline.buildPagesTable(prep, PipelineConfig(seed = 42L,
      nPages = nPages, partitions = 64, outputBuckets = 128, workDir = dir,
      sentMin = 24, sentSpread = 16))
    prep.stop()

    val spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.LinkedHashMap.empty[Int, JobSpan]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        jobs(e.jobId) = JobSpan(e.jobId, e.time, e.time, 0, 0L,
          Option(e.properties.getProperty("spark.job.description"))
            .orElse(Option(e.properties.getProperty("callSite.short")))
            .getOrElse("").take(60))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        // attribute to the newest open job (local mode: jobs rarely overlap)
        jobs.values.lastOption.foreach { j =>
          j.tasks += 1
          j.durs += e.taskInfo.duration
          j.lastTaskEnd = math.max(j.lastTaskEnd, e.taskInfo.finishTime)
          if (e.taskMetrics != null) j.runMs += e.taskMetrics.executorRunTime
        }
      }
    })

    (1 to 2).foreach { rep =>
      val shm = java.nio.file.Paths.get("/dev/shm")
      val out = Files.createTempDirectory(shm, s"graft-jp-$rep").toString
      Files.createSymbolicLink(java.nio.file.Paths.get(s"$out/pages"),
        java.nio.file.Paths.get(table))
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val wall0 = System.currentTimeMillis()
      Pipeline.build(spark, PipelineConfig(seed = 42L, nPages = nPages,
        partitions = cpus * 2, outputBuckets = 32, workDir = out,
        runId = s"jp-$rep", sentMin = 24, sentSpread = 16,
        writeSalt = sys.env.getOrElse("SPARK_GRAFT_PROBE_SALT", "1").toInt))
      val totalSec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftmetrics.ListenerFlush.flush(spark.sparkContext)
      val snap = jobs.synchronized(jobs.values.toVector.sortBy(_.start))
      println(f"[jobprobe] rep=$rep cpus=$cpus total=$totalSec%.2f s, jobs=${snap.size}")
      var cursor = wall0
      var gapTotal = 0L
      var jobTotal = 0L
      var idleInJob = 0.0
      snap.foreach { j =>
        val gap = j.start - cursor
        gapTotal += math.max(0, gap)
        val span = j.end - j.start
        jobTotal += span
        val occ = if (span > 0) j.runMs.toDouble / (span * cpus) else 1.0
        idleInJob += math.max(0.0, span * (1 - occ)) / 1000.0
        val ds = j.durs.sorted
        val tstats = if (ds.nonEmpty)
          f"p50=${ds(ds.size / 2)}%4d p95=${ds((ds.size * 95) / 100 min (ds.size - 1))}%5d max=${ds.last}%5d" else ""
        // commit = span after the LAST task ended (serial driver-side work:
        // committer renames, manifest, dynamic-overwrite juggling)
        val commitMs = if (j.lastTaskEnd > 0) math.max(0, j.end - j.lastTaskEnd) else 0L
        println(f"[jobprobe]   gap=${math.max(0, gap)}%5d ms | job ${j.id}%3d ${span}%6d ms tasks=${j.tasks}%4d occ=${occ * 100}%5.1f%% $tstats commit=$commitMs%5d ms ${j.desc}")
        cursor = math.max(cursor, j.end)
      }
      val tail = wall0 + (totalSec * 1000).toLong - cursor
      println(f"[jobprobe]   gaps=${gapTotal / 1000.0}%.2f s in-job=${jobTotal / 1000.0}%.2f s in-job-idle=$idleInJob%.2f s tail=${math.max(0, tail) / 1000.0}%.2f s")
      graft.io.IcebergishTable.drop(out)
    }
    spark.stop()
  }
}
