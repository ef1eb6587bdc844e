package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.IcebergishTable

/** DSv2 catalog: correctness, pushdown, bucket pruning, and the headline —
  * a bucket-key join between co-bucketed tables plans storage-partitioned
  * with ZERO exchanges (the reference's push-into-source spirit,
  * /root/reference/src/graph_loader.rs:978-1026).
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-warehouse").toString
    import spark.implicits._
    val edges = spark.range(0, 2000)
      .select(concat(lit("s"), col("id") % 80).as("subj"),
        lit("p").as("pred"), concat(lit("o"), col("id") % 40).as("obj"),
        concat(lit("u"), col("id")).as("url"), lit(1.0).as("conf"))
    IcebergishTable.write(edges, s"$dir/edges", "subj", 8)
    val vertices = graft.materialize.GraphOut
      .verticesBucketedPlan(edges, 8, 8)
      .select(col("id"), col("label"),
        col("props")("degree").cast("long").as("degree"),
        col(IcebergishTable.PartCol))
    // writePrePartitioned records the bucket spec (id, 8) in the manifest.
    IcebergishTable.writePrePartitioned(vertices, s"$dir/vertices", 8, "id")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", dir)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    dir
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("catalog read equals direct parquet read") {
    warehouse
    import spark.implicits._
    val viaCatalog = spark.table("graft.edges")
      .select("subj", "pred", "obj", "url")
      .as[(String, String, String, String)].collect().toSet
    val direct = IcebergishTable.read(spark, s"$warehouse/edges")
      .select("subj", "pred", "obj", "url")
      .as[(String, String, String, String)].collect().toSet
    assert(viaCatalog == direct && viaCatalog.nonEmpty)
  }

  test("column pruning and data-filter pushdown reach the V2 scan") {
    warehouse
    val df = spark.table("graft.edges")
      .select(col("subj")).where(col("subj") === "s7")
    val p = plan(df)
    assert(p.contains("GraftScan"), p)
    assert(p.contains("pushed=") && p.contains("subj,s7"),
      "data filter not pushed into the scan: " + p)
    // Pruned read schema: the scan must not materialize url/obj/conf.
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("url") && !scan.contains("conf"),
      "column pruning failed: " + scan)
    assert(df.count() == 25)
  }

  test("part predicates prune buckets exactly (partition pruning)") {
    warehouse
    val df = spark.table("graft.edges").where(col("part") === 3)
    val p = plan(df)
    assert(p.contains("buckets=List(3)"), "bucket not pruned:\n" + p)
    // Pruning is exact: same rows as the unpruned filter.
    val full = spark.table("graft.edges").collect()
      .count(_.getAs[Int]("part") == 3)
    assert(df.count() == full && full > 0)
  }

  test("mis-typed part predicate stays residual — no silent over-pruning") {
    warehouse
    import org.apache.spark.sql.sources.{EqualTo, In}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val tbl = new graft.sources.v2.GraftTable("edges", s"$warehouse/edges")

    // A Long-valued part filter (e.g. from an implicit cast) must NOT be
    // consumed: the old code classified it as a part filter, extracted
    // Set.empty, and pruned every bucket — zero rows instead of correct
    // results. Now it stays residual and the scan covers all buckets.
    val sbLong = tbl.newScanBuilder(CaseInsensitiveStringMap.empty())
      .asInstanceOf[graft.sources.v2.GraftScanBuilder]
    val residual = sbLong.pushFilters(Array(
      EqualTo(IcebergishTable.PartCol, 5L),
      In(IcebergishTable.PartCol, Array[Any](1L, 2L))))
    assert(residual.length == 2, residual.mkString(","))
    val partsLong = sbLong.build().toBatch.planInputPartitions()
    assert(partsLong.length == 8, s"over-pruned: ${partsLong.length} buckets")

    // The well-typed Int shape still prunes exactly and is consumed.
    val sbInt = tbl.newScanBuilder(CaseInsensitiveStringMap.empty())
      .asInstanceOf[graft.sources.v2.GraftScanBuilder]
    val residualInt = sbInt.pushFilters(Array(
      In(IcebergishTable.PartCol, Array[Any](3, 4))))
    assert(residualInt.isEmpty)
    assert(sbInt.build().toBatch.planInputPartitions().length == 2)
  }

  test("time travel through the catalog: option(snapshot) pins the manifest's files") {
    warehouse
    import spark.implicits._
    val table = s"$warehouse/tt"
    IcebergishTable.write(
      spark.range(0, 10).select(col("id").cast("string").as("k"), col("id").as("v")),
      table, "k", 4)
    val snap0 = IcebergishTable.currentSnapshot(table)
    IcebergishTable.write(
      spark.range(10, 25).select(col("id").cast("string").as("k"), col("id").as("v")),
      table, "k", 4, org.apache.spark.sql.SaveMode.Append)
    val now = spark.read.table("graft.tt").as[(String, Long, Int)].collect()
    assert(now.length == 25)
    val travel = spark.read.option("snapshot", snap0.toString)
      .table("graft.tt").select("v").as[Long].collect().toSet
    assert(travel == (0L until 10L).toSet, s"snapshot read wrong: $travel")
    intercept[SnapshotNotFound] {
      spark.read.option("snapshot", "99").table("graft.tt").count()
    }
  }

  test("bucket-key join between co-bucketed tables plans with ZERO exchanges (storage-partitioned join)") {
    warehouse
    import spark.implicits._
    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = noBroadcast.map { case (k, _) => k -> spark.conf.getOption(k) }
    noBroadcast.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val e = spark.table("graft.edges")
      val v = spark.table("graft.vertices")
      val joined = e.join(v, e("subj") === v("id"))
        .groupBy(v("id")).agg(count(lit(1)).as("n"), first(v("degree")).as("d"))
      val p = plan(joined)
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges == 0,
        s"expected a storage-partitioned join with 0 exchanges, got $exchanges:\n$p")
      // And it's the real join result.
      val got = joined.select(col("id"), col("n"), col("d"))
        .as[(String, Long, Long)].collect()
        .map { case (id, n, d) => id -> ((n, d)) }.toMap
      // 2000 edges over 80 subjects = 25 edges each; degree counts both
      // endpoint roles of the id.
      assert(got.size == 80)
      assert(got.keys.forall(_.startsWith("s")))
      assert(got.values.forall { case (n, _) => n == 25 })
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
