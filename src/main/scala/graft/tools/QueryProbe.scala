package graft.tools

import org.apache.spark.sql.SparkSession

/** Quiet-window timing probe for individual SparkEntry queries: N reps
  * each with a contemporaneous single-thread control sample (the host's
  * invisible-steal calibration, see Bench.controlSec) — the tool for
  * adjudicating "regression or noise?" on sub-second query timings.
  *
  * usage: runMain graft.tools.QueryProbe q_agg_group ann_brute_topk [reps]
  */
object QueryProbe {

  private def controlSec(): Double = {
    val t0 = System.nanoTime()
    var h = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < 300000000L) { h = graft.synth.Rng.mix64(h + i); i += 1 }
    if (h == 42L) System.err.println("")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val (names, reps) = args.partition(!_.forall(_.isDigit)) match {
      case (ns, Array(r)) => (ns.toSeq, r.toInt)
      case (ns, _) => (ns.toSeq, 5)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-query-probe")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    controlSec() // JIT-warm the control
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          fn(spark, sfDir).count() // warm (JIT + file listing + broadcast)
          val samples = (1 to reps).map { _ =>
            val c0 = controlSec()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            (sec, math.min(c0, controlSec()))
          }
          val best = samples.minBy(_._1)
          println(f"$name%-18s min=${best._1}%.3f s  all=[" +
            samples.map(s => f"${s._1}%.3f").mkString(",") +
            f"]  ctrl=[" + samples.map(s => f"${s._2}%.2f").mkString(",") + "]")
      }
    }
    spark.stop()
  }
}
