package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the minhash-LSH dedup query (dev tool): times the
  * signature pass, the band-bucket candidate join, and the verify join
  * separately so optimization effort lands on the phase that actually
  * costs (guide §1: measure first).
  */
object DedupProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-probe")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val sigs = Dedup.minhashSignatureFrame(
        docs, "doc_id", "text", 3, 128, 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("signatures (persist+count)")(sigs.count())
      val buckets = sigs.select(col("id"),
        posexplode(col("bandKeys")).as(Seq("band", "key")))
      val cand = buckets.toDF("ia", "band", "key")
        .join(buckets.toDF("ib", "band", "key"), Seq("band", "key"))
        .where(col("ia") < col("ib"))
        .select(col("ia"), col("ib"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // A groupBy(band,key)+collect_set+pair-explode variant was measured
      // here and LOST to the self-join (0.93-1.06 s vs 0.69-0.77 s warm at
      // sf0.1): the list aggregation costs more than the reused-exchange
      // join. Negative result kept as a comment so it isn't re-tried.
      timed("candidates (join+distinct)")(cand.count())
      val out = Dedup.jaccardVerify(
        cand, sigs.select(col("id"), col("sh")), 0.5)
      timed("verify (join+intersect)")(out.count())
      timed("full query")(
        Dedup.minhashLshPairs(docs, "doc_id", "text").count())
      sigs.unpersist(blocking = false)
      cand.unpersist(blocking = false)
    }
    spark.stop()
  }
}
