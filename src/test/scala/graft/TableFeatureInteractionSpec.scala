package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.io.{IcebergishTable, ManifestStats}

/** Feature INTERACTIONS on one table: zone maps × column rename × MOR
  * deletes × partition-spec evolution × compaction — the places where
  * independent table-format features corrupt each other if their
  * metadata assumptions drift.
  */
class TableFeatureInteractionSpec extends SparkSpec {

  test("rename → zone maps stay conservative for old files, exact for new") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-ix1").resolve("t").toString
    // Era 1 under the ORIGINAL column name.
    IcebergishTable.write((0 until 40).map(i => (s"k$i", i.toLong))
      .toDF("k", "v"), t, "k", 4)
    IcebergishTable.renameColumn(t, "v", "value")
    // Era 2 appends under the NEW name (stats recorded under "value").
    IcebergishTable.write((0 until 40).map(i => (s"k$i", 1000L + i))
      .toDF("k", "value"), t, "k", 4, SaveMode.Append)

    val snap = IcebergishTable.currentSnapshot(t)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(IcebergishTable.manifestMeta(t)._1)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val all = IcebergishTable.snapshotFiles(t, snap)
    val preds = ManifestStats.fromColumn(col("value") >= 1000L, schema)
    val cand = ManifestStats.prune(t, snap, schema, preds, all)
    // Old files' stats are keyed by the OLD name ("v") → they cannot be
    // excluded (conservative), new files prune exactly. The candidate set
    // must therefore be a SUPERSET of era 2 and include every era-1 file.
    assert(cand.size == all.size, // era-1 kept conservatively + era-2 match
      s"rename broke conservatism: ${cand.size} of ${all.size}")
    // But a predicate matching NOTHING in era 2 still prunes era-2 files
    // (their stats are under the current name).
    val none = ManifestStats.prune(t, snap, schema,
      ManifestStats.fromColumn(col("value") >= 5000L, schema), all)
    assert(none.size < all.size, "new-era files failed to prune post-rename")
    // Correctness through the full read regardless of pruning:
    assert(IcebergishTable.read(spark, t).where(col("value") >= 1000L)
      .count() == 40)
  }

  test("MOR delete → rename → rebucket → compact: rows exact at every step") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-ix2").resolve("t").toString
    IcebergishTable.write(
      (0 until 100).map(i => (s"k$i", s"g${i % 3}", i.toLong))
        .toDF("k", "g", "v"), t, "k", 4)

    // 1. MOR delete (tombstone, no file rewritten).
    assert(IcebergishTable.deleteWhere(spark, t,
      col("v").isin(5L, 50L, 95L), morMaxRows = 10L) == 3L)
    assert(IcebergishTable.read(spark, t).count() == 97)

    // 2. Rename a column while tombstones are live — the tombstone
    // references (file, ordinal), not names, so it must keep applying.
    IcebergishTable.renameColumn(t, "v", "value")
    assert(IcebergishTable.read(spark, t).count() == 97)
    assert(IcebergishTable.read(spark, t)
      .where(col("value") === 50L).count() == 0)

    // 3. Rebucket to the other key — rewrites every row, folds tombstones
    // (replace-all drops the delete list) and keeps the rename.
    IcebergishTable.rebucket(spark, t, "g", 8)
    val cur = IcebergishTable.currentSnapshot(t)
    assert(IcebergishTable.snapshotDeleteFiles(t, cur).isEmpty)
    assert(IcebergishTable.read(spark, t).count() == 97)
    assert(IcebergishTable.read(spark, t).agg(sum("value")).as[Long].head() ==
      (0 until 100).map(_.toLong).sum - 5L - 50L - 95L)
    assert(IcebergishTable.bucketSpecOf(t).contains(("g", 8)))

    // 4. Another MOR delete + a MOR merge on the NEW layout, then compact.
    assert(IcebergishTable.deleteWhere(spark, t, col("value") === 7L,
      morMaxRows = 5L) == 1L)
    IcebergishTable.mergeRows(t,
      Seq(("kNew", "g1", 7777L)).toDF("k", "g", "value"),
      Seq("k"), morMaxRows = 5L)
    assert(IcebergishTable.read(spark, t).count() == 97)
    IcebergishTable.compact(spark, t, 8, "g")
    assert(IcebergishTable.read(spark, t).count() == 97)
    assert(IcebergishTable.read(spark, t)
      .where(col("k") === "kNew").select("value").as[Long].head() == 7777L)
    // Zone maps on the compacted files are live for the renamed column.
    val snap = IcebergishTable.currentSnapshot(t)
    val stats = ManifestStats.fileStatsOf(t, snap)
    assert(stats.nonEmpty && stats.values.exists(_.contains("value")))
  }
}
