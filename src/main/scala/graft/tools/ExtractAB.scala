package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Page, Pipeline, Triple}
import graft.link.{AliasTrie, Mentions}
import graft.synth.PageSynth
import graft.triples.TripleExtract

/** Interleaved A/B of the extract-stage input width (dev tool): the OLD
  * flatMap over the full Page object (deserializes html bytes per row)
  * vs the NEW select(url, text) narrow form, alternated in one JVM so a
  * host-noise window can't masquerade as a code effect. noop sink.
  *
  * usage: runMain graft.tools.ExtractAB <pagesTableDir> [reps]
  */
object ExtractAB {

  def main(args: Array[String]): Unit = {
    val table = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-extract-ab")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val aliases = PageSynth.aliasDictionary
    val phrases = PageSynth.relations.toMap
    val trieB = spark.sparkContext.broadcast(
      AliasTrie.build(aliases.map(_.alias).distinct))
    val winnersB = spark.sparkContext.broadcast(Mentions.aliasWinners(aliases))
    val phrasesB = spark.sparkContext.broadcast(phrases)

    def pages = Pipeline.readPagesForExtraction(spark, table)

    def emit(url: String, text: String): Seq[Triple] = {
      val ms = Mentions.scanText(url, text, trieB.value)
      val linked = Mentions.linkLocal(ms, winnersB.value)
      val byBegin = linked.map(l => l.begin -> l).toMap
      TripleExtract.allCandidates(url, text, ms, phrasesB.value).flatMap { c =>
        for (a <- byBegin.get(c.beginA); b <- byBegin.get(c.beginB))
          yield Triple(a.entity, c.pred, b.entity, url,
            math.min(a.conf, b.conf))
      }
    }

    def wide() = pages.flatMap(p => emit(p.url, p.text)).toDF
    def narrow() = pages.select($"url", $"text").as[(String, String)]
      .flatMap { case (u, t) => emit(u, t) }.toDF

    def timed(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[ab] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    timed("warm-narrow")(narrow())
    timed("warm-wide")(wide())
    (1 to reps).foreach { _ =>
      timed("wide  ")(wide())
      timed("narrow")(narrow())
    }
    spark.stop()
  }
}
