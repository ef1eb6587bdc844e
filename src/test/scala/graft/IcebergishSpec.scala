package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.IcebergishTable
import graft.streaming.StreamingKg
import graft.synth.PageSynth

/** Iceberg-style table semantics (snapshots, time travel, commit chain)
  * and the incremental streaming KG build.
  */
class IcebergishSpec extends SparkSpec {

  test("append creates snapshots; readSnapshot time-travels; current read sees all") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-ice").toString + "/t"
    val df1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    IcebergishTable.write(df1, t, "k", 4)
    val s0 = IcebergishTable.currentSnapshot(t)
    val df2 = Seq(("c", 3L)).toDF("k", "v")
    IcebergishTable.write(df2, t, "k", 4,
      org.apache.spark.sql.SaveMode.Append)
    val s1 = IcebergishTable.currentSnapshot(t)
    assert(s1 == s0 + 1)

    val now = IcebergishTable.read(spark, t)
      .select("k").as[String].collect().toSet
    assert(now == Set("a", "b", "c"))
    val old = IcebergishTable.readSnapshot(spark, t, s0)
      .select("k").as[String].collect().toSet
    assert(old == Set("a", "b"))
    val cur = IcebergishTable.readSnapshot(spark, t, s1)
      .select("k").as[String].collect().toSet
    assert(cur == Set("a", "b", "c"))
  }

  test("invalid pipeline config is rejected at init") {
    intercept[InvalidConfig] {
      Pipeline.validate(PipelineConfig(nPages = 0))
    }
    intercept[InvalidConfig] {
      Pipeline.validate(PipelineConfig(outputBuckets = -1))
    }
    intercept[InvalidConfig] {
      Pipeline.validate(PipelineConfig(runId = ""))
    }
    Pipeline.validate(PipelineConfig()) // default is valid
  }

  test("incremental streaming KG: new files yield only new triples; union equals batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-skg").toString
    val pagesDir = s"$base/pages-data"
    Files.createDirectories(java.nio.file.Paths.get(pagesDir))
    val canon = PageSynth.sameAsPairs.map { case (c, d) => d -> c }.toMap

    // Batch 1 of pages lands.
    PageSynth.pages(spark, 21L, 120L, 2).toDF
      .write.mode("append").parquet(pagesDir)
    val out1 = StreamingKg.buildIncremental(spark, pagesDir,
      s"$base/triples", s"$base/ckpt", canon)
    val n1 = out1.count()
    assert(n1 > 0)

    // Batch 2 lands (different seed → different urls); only it is processed.
    PageSynth.pages(spark, 22L, 80L, 2).toDF
      .write.mode("append").parquet(pagesDir)
    val out2 = StreamingKg.buildIncremental(spark, pagesDir,
      s"$base/triples", s"$base/ckpt", canon)
    val n2 = out2.count()
    assert(n2 > n1)

    // Equivalent batch computation over all pages:
    val pages = spark.read.parquet(pagesDir)
      .select(col("url"), col("warc_ts"), col("html"),
        graft.functions.HtmlExtractExpr.html_extract(col("html")).as("text"),
        col("lang")).as[Page]
    val batch = graft.triples.TripleExtract.extractDirect(pages,
        PageSynth.aliasDictionary, PageSynth.relations.toMap)
      .map(t => (canon.getOrElse(t.subj, t.subj), t.pred,
        canon.getOrElse(t.obj, t.obj), t.url))
      .collect().toSet
    val streamed = out2.select("subj", "pred", "obj", "url")
      .as[(String, String, String, String)].collect().toSet
    assert(streamed == batch)
  }

  test("late/duplicated pages converge: incremental build equals batch over unique pages") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-skgl").toString
    val pagesDir = s"$base/pages-data"
    Files.createDirectories(java.nio.file.Paths.get(pagesDir))
    val canon = PageSynth.sameAsPairs.map { case (c, d) => d -> c }.toMap
    val table = s"$base/edges"
    val all = PageSynth.pages(spark, 31L, 120L, 2).toDF.localCheckpoint()
    val half = pmod(xxhash64(col("url")), lit(2))

    // Delivery is OUT OF ORDER and DUPLICATED: the second half arrives
    // first; then the first half arrives together with a LATE re-delivery
    // of the entire second half (an upstream retry).
    all.where(half === 1).write.mode("append").parquet(pagesDir)
    StreamingKg.buildIncrementalBucketed(spark, pagesDir, table,
      s"$base/ckpt", canon, numParts = 8)
    all.where(half === 0).write.mode("append").parquet(pagesDir)
    all.where(half === 1).write.mode("append").parquet(pagesDir) // late dupe
    val out = StreamingKg.buildIncrementalBucketed(spark, pagesDir, table,
      s"$base/ckpt", canon, numParts = 8)

    // Batch build over the UNIQUE pages:
    val pages = all
      .select(col("url"), col("warc_ts"), col("html"),
        graft.functions.HtmlExtractExpr.html_extract(col("html")).as("text"),
        col("lang")).as[Page]
    val batch = graft.triples.TripleExtract.extractDirect(pages,
        PageSynth.aliasDictionary, PageSynth.relations.toMap)
      .map(t => (canon.getOrElse(t.subj, t.subj), t.pred,
        canon.getOrElse(t.obj, t.obj), t.url))
      .collect().toSet
    val streamed = out.select("subj", "pred", "obj", "url")
      .as[(String, String, String, String)].collect()
    assert(streamed.toSet == batch,
      s"missing=${(batch -- streamed.toSet).take(3)} extra=${(streamed.toSet -- batch).take(3)}")
    // Convergence is EXACT: the late re-delivery added zero duplicate rows.
    assert(streamed.length == batch.size)
  }

  test("incremental KG into the bucketed Icebergish table: exactly-once across replays") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-skgb").toString
    val pagesDir = s"$base/pages-data"
    Files.createDirectories(java.nio.file.Paths.get(pagesDir))
    val canon = PageSynth.sameAsPairs.map { case (c, d) => d -> c }.toMap
    val table = s"$base/edges"

    PageSynth.pages(spark, 31L, 100L, 2).toDF
      .write.mode("append").parquet(pagesDir)
    val out1 = StreamingKg.buildIncrementalBucketed(spark, pagesDir,
      table, s"$base/ckpt", canon, numParts = 8)
    val n1 = out1.count()
    assert(n1 > 0)
    val snap1 = graft.io.IcebergishTable.currentSnapshot(table)

    // Replay the SAME micro-batch id directly (crash-between-commits case):
    // the ack log must make it a no-op — no duplicate files, no new rows.
    val pages = spark.read.parquet(pagesDir)
      .select(col("url"), col("warc_ts"), col("html"),
        graft.functions.HtmlExtractExpr.html_extract(col("html")).as("text"),
        col("lang")).as[Page]
    val replay = graft.triples.TripleExtract.extractDirect(pages,
        PageSynth.aliasDictionary, PageSynth.relations.toMap)
      .map(t => t.copy(subj = canon.getOrElse(t.subj, t.subj),
        obj = canon.getOrElse(t.obj, t.obj))).toDF
    StreamingKg.appendBatch(replay, table, batchId = 0L, numParts = 8)
    assert(graft.io.IcebergishTable.read(spark, table).count() == n1)
    assert(graft.io.IcebergishTable.currentSnapshot(table) == snap1)

    // New files → only the new batch appends; total equals full batch calc.
    PageSynth.pages(spark, 32L, 60L, 2).toDF
      .write.mode("append").parquet(pagesDir)
    val out2 = StreamingKg.buildIncrementalBucketed(spark, pagesDir,
      table, s"$base/ckpt", canon, numParts = 8)
    assert(out2.count() > n1)
    val allPages = spark.read.parquet(pagesDir)
      .select(col("url"), col("warc_ts"), col("html"),
        graft.functions.HtmlExtractExpr.html_extract(col("html")).as("text"),
        col("lang")).as[Page]
    val batchSet = graft.triples.TripleExtract.extractDirect(allPages,
        PageSynth.aliasDictionary, PageSynth.relations.toMap)
      .map(t => (canon.getOrElse(t.subj, t.subj), t.pred,
        canon.getOrElse(t.obj, t.obj), t.url))
      .collect().toSet
    val got = graft.io.IcebergishTable.read(spark, table)
      .select("subj", "pred", "obj", "url")
      .as[(String, String, String, String)].collect().toSet
    assert(got == batchSet)
  }

  test("compaction tombstones superseded files; time travel survives until snapshots expire") {
    import spark.implicits._
    import graft.io.IcebergishTable
    val base = Files.createTempDirectory("graft-compact").toString
    val table = s"$base/edges"
    (0 until 3).foreach { b =>
      StreamingKg.appendBatch(
        Seq(Triple(s"A$b", "p", s"B$b", s"u$b", 1.0),
          Triple(s"C$b", "p", s"D$b", s"v$b", 1.0)).toDF,
        table, b.toLong, 4)
    }
    val before = IcebergishTable.read(spark, table)
      .select("subj").as[String].collect().toSet
    assert(before.size == 6)
    val preSnap = IcebergishTable.currentSnapshot(table)
    val filesBefore = IcebergishTable.liveDataFiles(table).size
    assert(filesBefore > 4, s"appends should accumulate files: $filesBefore")

    IcebergishTable.compact(spark, table, 4, "subj")
    // Content identical, live files collapsed to ≤ one per bucket.
    val after = IcebergishTable.read(spark, table)
      .select("subj").as[String].collect().toSet
    assert(after == before)
    assert(IcebergishTable.liveDataFiles(table).size <= 4)
    // Pre-compaction snapshot still time-travels (old files tombstoned,
    // not deleted).
    val travel = IcebergishTable.readSnapshot(spark, table, preSnap)
      .select("subj").as[String].collect().toSet
    assert(travel == before)

    // Expiry reclaims the tombstoned files; current read unaffected,
    // expired manifests gone.
    IcebergishTable.expireSnapshots(table, keepLast = 1)
    assert(IcebergishTable.read(spark, table)
      .select("subj").as[String].collect().toSet == before)
    intercept[SnapshotNotFound] {
      IcebergishTable.readSnapshot(spark, table, preSnap)
    }
  }

  test("committer staging files (_temporary) are never treated as data") {
    import spark.implicits._
    import graft.io.IcebergishTable
    val base = Files.createTempDirectory("graft-staged").toString
    val table = s"$base/t"
    IcebergishTable.write(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), table, "k", 4)
    val n0 = IcebergishTable.read(spark, table).count()

    // Plant a staged task file the way a crashed/concurrent write would
    // leave it: a real parquet file under data/part=0/_temporary/... .
    val live = IcebergishTable.liveDataFiles(table).head
    val staged = java.nio.file.Paths.get(table,
      "data", s"${IcebergishTable.PartCol}=0", "_temporary", "0",
      "task_000", "part-staged.parquet")
    Files.createDirectories(staged.getParent)
    Files.copy(java.nio.file.Paths.get(table, live), staged)

    // Current reads skip it; the next directory-derived commit must not
    // record it in the new manifest either.
    assert(IcebergishTable.read(spark, table).count() == n0)
    IcebergishTable.write(Seq(("c", 3L)).toDF("k", "v"), table, "k", 4,
      org.apache.spark.sql.SaveMode.Append)
    assert(IcebergishTable.read(spark, table).count() == n0 + 1)
    val snap = IcebergishTable.currentSnapshot(table)
    assert(!IcebergishTable.snapshotFiles(table, snap)
      .exists(_.contains("_temporary")),
      "staged file leaked into the snapshot manifest")
  }

  test("rollback over a compaction un-tombstones the restored snapshot's files") {
    import spark.implicits._
    import graft.io.IcebergishTable
    val base = Files.createTempDirectory("graft-rbcomp").toString
    val table = s"$base/t"
    IcebergishTable.write(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), table, "k", 4)
    IcebergishTable.write(Seq(("c", 3L)).toDF("k", "v"), table, "k", 4,
      org.apache.spark.sql.SaveMode.Append)
    val preCompact = IcebergishTable.currentSnapshot(table)
    IcebergishTable.compact(spark, table, 4, "k")
    IcebergishTable.write(Seq(("d", 4L)).toDF("k", "v"), table, "k", 4,
      org.apache.spark.sql.SaveMode.Append)
    val top = IcebergishTable.currentSnapshot(table)

    // Roll back BEHIND the compaction: its input files were tombstoned,
    // but they ARE the restored snapshot's live set — read() must see them
    // again (round-2 ADVICE: stale TOMBSTONES made the table read empty).
    IcebergishTable.rollbackTo(table, preCompact)
    assert(IcebergishTable.currentSnapshot(table) == preCompact)
    val got = IcebergishTable.read(spark, table)
      .select("k").as[String].collect().toSet
    assert(got == Set("a", "b", "c"), s"rolled-back read wrong: $got")
    // Rolled-back-over manifests are gone; a fresh append restarts the chain.
    ((preCompact + 1) to top).foreach { s =>
      intercept[SnapshotNotFound] { IcebergishTable.readSnapshot(spark, table, s) }
    }
    IcebergishTable.write(Seq(("e", 5L)).toDF("k", "v"), table, "k", 4,
      org.apache.spark.sql.SaveMode.Append)
    assert(IcebergishTable.read(spark, table)
      .select("k").as[String].collect().toSet == Set("a", "b", "c", "e"))
  }

  test("streaming crash BETWEEN parquet commit and manifest swap: replay still exactly-once") {
    import spark.implicits._
    import graft.io.IcebergishTable
    val base = Files.createTempDirectory("graft-skgc2").toString
    val table = s"$base/edges"
    StreamingKg.appendBatch(Seq(Triple("A", "p", "B", "u1", 1.0)).toDF, table, 0L, 4)
    val pre = IcebergishTable.currentSnapshot(table)

    // Simulate batch 1 crashing AFTER its parquet job committed files into
    // the bucket dirs but BEFORE commit() wrote the manifest/VERSION:
    // pending ack + raw file append, no new snapshot. (Round-2 ADVICE high:
    // the old snapshot-advanced guard missed this window entirely.)
    val b1 = Seq(Triple("C", "p", "D", "u2", 1.0)).toDF
    graft.materialize.Checkpoint.append(spark, s"$table-acks", Seq(
      CheckpointRow("stream", "append", 0, "batch-1", pre.toString,
        0L, 0L, 0L, "pending")))
    b1.withColumn(IcebergishTable.PartCol, IcebergishTable.partExpr("subj", 4))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy(IcebergishTable.PartCol)
      .parquet(s"$table/data")
    assert(IcebergishTable.currentSnapshot(table) == pre) // no manifest landed

    // Replay must sweep the orphaned first-attempt files, then apply once.
    StreamingKg.appendBatch(b1, table, 1L, 4)
    val rows = IcebergishTable.read(spark, table)
      .select("subj").as[String].collect().toSeq.sorted
    assert(rows == Seq("A", "C"), s"duplicates after replay: $rows")
  }

  test("streaming append crash window: appended-but-unacked batch rolls back on replay") {
    import spark.implicits._
    import graft.io.IcebergishTable
    val base = Files.createTempDirectory("graft-skgc").toString
    val table = s"$base/edges"
    val b0 = Seq(Triple("A", "p", "B", "u1", 1.0)).toDF
    val b1 = Seq(Triple("C", "p", "D", "u2", 1.0),
      Triple("E", "p", "F", "u3", 1.0)).toDF
    StreamingKg.appendBatch(b0, table, 0L, 4)
    val n0 = IcebergishTable.read(spark, table).count()
    assert(n0 == 1)

    // Simulate an attempt of batch 1 that crashed AFTER appending its files
    // but BEFORE writing the done ack: pending ack + raw append, no done.
    val pre = IcebergishTable.currentSnapshot(table)
    graft.materialize.Checkpoint.append(spark, s"$table-acks", Seq(
      CheckpointRow("stream", "append", 0, "batch-1", pre.toString,
        0L, 0L, 0L, "pending")))
    val deduped = graft.materialize.GraphOut.bucketedDedupPlan(
      b1.withColumn(IcebergishTable.PartCol,
        IcebergishTable.partExpr("subj", 4)), 8,
      Seq("subj", "pred", "obj", "url"))
    IcebergishTable.appendPrePartitioned(deduped, table, 4, "subj")
    assert(IcebergishTable.read(spark, table).count() == 3) // orphan rows live

    // Replay of batch 1 must roll the orphan append back, then apply once.
    StreamingKg.appendBatch(b1, table, 1L, 4)
    val rows = IcebergishTable.read(spark, table)
      .select("subj").as[String].collect().toSeq.sorted
    assert(rows == Seq("A", "C", "E"), s"duplicates after replay: $rows")
  }

  test("read() is manifest-based: files landed by an uncommitted write stay invisible") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-snapread").toString + "/t"
    IcebergishTable.write(
      (0 until 20).map(i => (s"k$i", i.toLong)).toDF("k", "v"), table, "k", 4)
    val before = IcebergishTable.read(spark, table).count()
    assert(before == 20)
    // Simulate a concurrent append mid-flight: its parquet file is already
    // in a bucket directory but its commit has not happened yet. A
    // directory-derived read would leak these rows; the manifest-based
    // read must not.
    val bucketDir = {
      val s = Files.list(java.nio.file.Paths.get(s"$table/data"))
      try s.iterator().next() finally s.close()
    }
    val existing = {
      val s = Files.list(bucketDir)
      try s.iterator().next() finally s.close()
    }
    Files.copy(existing, bucketDir.resolve("part-inflight-uncommitted.parquet"))
    assert(IcebergishTable.read(spark, table).count() == before,
      "uncommitted file leaked into a current-state read")
  }

  test("overwrite drops old manifests: pinned reads of the old state fail loudly") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-ow").toString + "/t"
    def rows(a: Int, b: Int) = (a until b)
      .map(i => (s"k$i", i.toLong)).toDF("k", "v")
    IcebergishTable.write(rows(0, 10), table, "k", 4)
    IcebergishTable.write(rows(10, 15), table, "k", 4,
      org.apache.spark.sql.SaveMode.Append)
    val preSnap = IcebergishTable.currentSnapshot(table)
    IcebergishTable.write(rows(100, 103), table, "k", 4) // overwrite
    // New state reads; the overwritten snapshots' files are GONE, so both
    // bespoke and DSv2 pinned reads must fail loudly, not return empty.
    assert(IcebergishTable.read(spark, table).count() == 3)
    intercept[SnapshotNotFound] {
      IcebergishTable.readSnapshot(spark, table, preSnap)
    }
    val tbl = new graft.sources.v2.GraftTable("t", table)
    val opts = new java.util.HashMap[String, String]()
    opts.put("snapshot", preSnap.toString)
    intercept[SnapshotNotFound] {
      tbl.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
        .build().toBatch.planInputPartitions()
    }
  }

  test("a legitimately EMPTY snapshot reads typed and plans empty — not as expired") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-empty").toString + "/t"
    IcebergishTable.createEmpty(table,
      Seq(("a", 1L)).toDF("k", "v").schema, "k", 4)
    // Schema-typed empty frame (a zero-column one would break .select).
    val snap0 = IcebergishTable.readSnapshot(spark, table, 0)
    assert(snap0.select("k", "v").count() == 0)
    // Pinned DSv2 scan of the empty snapshot plans zero partitions.
    val tbl = new graft.sources.v2.GraftTable("t", table)
    val opts = new java.util.HashMap[String, String]()
    opts.put("snapshot", "0")
    val parts = tbl.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
      .build().toBatch.planInputPartitions()
    assert(parts.isEmpty)
  }

  test("commit CAS: a racing writer's manifest is never clobbered — the chain steps past it") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-cas").toString + "/t"
    IcebergishTable.write(
      (0 until 8).map(i => (s"k$i", i.toLong)).toDF("k", "v"), table, "k", 4)
    val s = IcebergishTable.currentSnapshot(table)
    // Simulate another JVM that placed snap-(s+1) but has not (yet)
    // swapped VERSION — invisible to this JVM's commit monitor.
    val racer = java.nio.file.Paths.get(table, s"snap-${s + 1}.json")
    val racerBytes = "RACER-MANIFEST".getBytes("UTF-8")
    Files.write(racer, racerBytes)
    IcebergishTable.write(
      Seq(("extra", 99L)).toDF("k", "v"), table, "k", 4,
      org.apache.spark.sql.SaveMode.Append)
    // Our commit stepped past the racer's number instead of overwriting it.
    assert(IcebergishTable.currentSnapshot(table) == s + 2)
    assert(java.util.Arrays.equals(Files.readAllBytes(racer), racerBytes),
      "racing writer's manifest was clobbered")
    assert(IcebergishTable.read(spark, table).count() == 9)
  }

  test("multi-writer: concurrent threads appending to ONE table all survive, union visible") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-mw").toString + "/t"
    IcebergishTable.write(
      (0 until 8).map(i => (s"seed$i", i.toLong)).toDF("k", "v"), table, "k", 4)
    val s0 = IcebergishTable.currentSnapshot(table)
    // 4 writers × 2 appends each, racing through the PUBLIC append path.
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        try (0 until 2).foreach { i =>
          IcebergishTable.write(
            Seq((s"w$w-$i", (w * 10 + i).toLong)).toDF("k", "v"),
            table, "k", 4, org.apache.spark.sql.SaveMode.Append)
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent append failed: ${errors.peek()}")
    // Every commit survived: 8 appends → 8 new CONTIGUOUS snapshots…
    assert(IcebergishTable.currentSnapshot(table) == s0 + 8)
    // …the union of all writers' rows is visible…
    val ks = IcebergishTable.read(spark, table).select("k").as[String]
      .collect().toSet
    val expected = (0 until 8).map(i => s"seed$i").toSet ++
      (for (w <- 0 until 4; i <- 0 until 2) yield s"w$w-$i")
    assert(ks == expected, s"missing: ${expected -- ks}")
    // …no torn manifest: every snapshot in the chain parses, every file the
    // final manifest references exists on disk, and file lists only GROW
    // along the chain (appends never drop a predecessor's files).
    val chains = (s0 to s0 + 8).map(s =>
      IcebergishTable.snapshotFilesOpt(table, s).getOrElse(
        fail(s"snapshot $s unreadable")).toSet)
    chains.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), s"append dropped files: ${a -- b}")
    }
    chains.last.foreach(f => assert(
      Files.exists(java.nio.file.Paths.get(table, f)), s"missing file $f"))
  }

  test("multi-writer: two separate JVMs race commits through the filesystem CAS") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-mw2").toString + "/t"
    IcebergishTable.write(
      (0 until 8).map(i => (s"seed$i", i.toLong)).toDF("k", "v"), table, "k", 4)
    val s0 = IcebergishTable.currentSnapshot(table)
    val rowsBefore = IcebergishTable.read(spark, table).count()
    // Any committed data file serves as the seed payload each child
    // re-commits under fresh names (into its own source bucket).
    val seedRel = IcebergishTable.snapshotFiles(table, s0).headOption
      .getOrElse(fail("no committed data file"))
    val seedBucket = IcebergishTable.bucketOfPath(seedRel)
    val seedRows = spark.read.parquet(s"$table/$seedRel").count()
    val seedAbs = java.nio.file.Paths.get(table, seedRel).toAbsolutePath.toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val perChild = 5
    val procs = Seq("jvmA", "jvmB").map { id =>
      new ProcessBuilder(javaBin, "-cp", System.getProperty("java.class.path"),
        "graft.tools.CommitRaceChild", table, id, perChild.toString,
        seedAbs, seedBucket.toString).inheritIO().start()
    }
    procs.foreach { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM timed out")
      assert(p.exitValue() == 0, s"child JVM failed: ${p.exitValue()}")
    }
    // Both JVMs' commits all survived: 10 contiguous snapshots, every file
    // referenced, full union readable.
    assert(IcebergishTable.currentSnapshot(table) == s0 + 10)
    val finalFiles = IcebergishTable.snapshotFiles(
      table, IcebergishTable.currentSnapshot(table))
    assert(finalFiles.count(_.contains("race-jvmA")) == perChild)
    assert(finalFiles.count(_.contains("race-jvmB")) == perChild)
    finalFiles.foreach(f => assert(
      Files.exists(java.nio.file.Paths.get(table, f)), s"missing file $f"))
    assert(IcebergishTable.read(spark, table).count() ==
      rowsBefore + 2 * perChild * seedRows)
  }

  test("part-filtered manifest reads prune at the FILE level (the COW/stream bucket-scoping premise)") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-prune").toString + "/t"
    IcebergishTable.write(
      spark.range(0, 1000).select(concat(lit("k"), col("id") % 37).as("k"),
        col("id").as("v")),
      table, "k", 8)
    val pruned = IcebergishTable.read(spark, table)
      .where(col(IcebergishTable.PartCol).isin(2, 5))
    // Materialize THIS df's own query execution, then read the scan node's
    // metrics from the same plan instance.
    assert(pruned.collect().length > 0)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in plan"))
    assert(scan.toString.contains("PartitionFilters: ["), scan.toString.take(400))
    // Only the two requested buckets' files are read — deleteWhere/
    // mergeRows/the streaming anti-join read exactly the buckets they
    // touch, not the table. (One file per bucket by construction.)
    assert(scan.metrics("numFiles").value == 2,
      s"files read: ${scan.metrics("numFiles").value}")
  }

  test("COW deleteWhere rewrites only touched buckets; time travel keeps deleted rows") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-del").toString + "/t"
    IcebergishTable.write(
      (0 until 64).map(i => (s"k${i % 16}", i.toLong)).toDF("k", "v"),
      table, "k", 8)
    val s0 = IcebergishTable.currentSnapshot(table)
    val before = IcebergishTable.snapshotFiles(table, s0)

    // Delete one key's rows (4 of 64). NULL-eval rows must survive: the
    // condition is null for v = 63 (planted via nullif) — not deleted.
    val cond = (col("k") === "k3") || (expr("nullif(v, 63)") > 100L)
    val deleted = IcebergishTable.deleteWhere(spark, table, cond)
    assert(deleted == 4, s"deleted $deleted")
    val now = IcebergishTable.read(spark, table)
    assert(now.count() == 60)
    assert(now.where(col("k") === "k3").count() == 0)
    assert(now.where(col("v") === 63L).count() == 1) // null-cond row kept

    // Only the hit bucket was rewritten: every other bucket's files carry
    // forward BYTE-IDENTICAL (same relative paths).
    val hitBucket = Seq(("k3", 1)).toDF("k", "x")
      .select(IcebergishTable.partExpr("k", 8)).head().getInt(0)
    val after = IcebergishTable.snapshotFiles(
      table, IcebergishTable.currentSnapshot(table))
    val untouchedBefore = before.filterNot(f =>
      IcebergishTable.bucketOfPath(f) == hitBucket).toSet
    assert(untouchedBefore.subsetOf(after.toSet),
      s"untouched buckets rewritten: ${untouchedBefore -- after.toSet}")
    assert(!after.exists(f => before.contains(f) &&
      IcebergishTable.bucketOfPath(f) == hitBucket),
      "hit bucket's old files still referenced")

    // Time travel: the pre-delete snapshot still shows the deleted rows.
    assert(IcebergishTable.readSnapshot(spark, table, s0).count() == 64)
    // Expiry reclaims the replaced files.
    IcebergishTable.expireSnapshots(table, keepLast = 1)
    intercept[SnapshotNotFound] {
      IcebergishTable.readSnapshot(spark, table, s0).count()
    }
    assert(IcebergishTable.read(spark, table).count() == 60)

    // A no-match delete is a free no-op (no new snapshot).
    val snapBefore = IcebergishTable.currentSnapshot(table)
    assert(IcebergishTable.deleteWhere(spark, table, col("k") === "nope") == 0)
    assert(IcebergishTable.currentSnapshot(table) == snapBefore)
  }

  test("COW mergeRows upserts atomically: updates replace by key, inserts append, one commit") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-mrg").toString + "/t"
    IcebergishTable.write(
      (0 until 40).map(i => (s"k${i % 10}", i.toLong, s"old$i"))
        .toDF("k", "id", "tag"),
      table, "k", 8)
    val s0 = IcebergishTable.currentSnapshot(table)
    // Updates: ids 0-9 get new tags; ids 100-104 are fresh inserts.
    val updates = ((0 until 10).map(i => (s"k${i % 10}", i.toLong, s"new$i")) ++
      (100 until 105).map(i => (s"k${i % 10}", i.toLong, s"ins$i")))
      .toDF("k", "id", "tag")
    IcebergishTable.mergeRows(table, updates, Seq("k", "id"))
    assert(IcebergishTable.currentSnapshot(table) == s0 + 1) // ONE commit

    val now = IcebergishTable.read(spark, table)
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(now.size == 45)
    (0 until 10).foreach(i => assert(now(i.toLong) == s"new$i"))
    (10 until 40).foreach(i => assert(now(i.toLong) == s"old$i"))
    (100 until 105).foreach(i => assert(now(i.toLong) == s"ins$i"))
    // Pre-merge snapshot still time-travels to the old tags.
    val old = IcebergishTable.readSnapshot(spark, table, s0)
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(old.size == 40 && old(0L) == "old0")

    // Cross-bucket key move: merging ON A SURROGATE KEY ONLY (id), with an
    // update that changes the BUCKET key (k) for an existing id — the old
    // row lives in a bucket the update does not hash into, and must still
    // be replaced (key-pruned scan widens the touched set), not survive
    // beside the insert as a duplicate id.
    IcebergishTable.mergeRows(table,
      Seq(("moved", 5L, "mv5")).toDF("k", "id", "tag"), Seq("id"))
    val afterMove = IcebergishTable.read(spark, table)
      .where(col("id") === 5L)
      .select("k", "tag").as[(String, String)].collect().toSeq
    assert(afterMove == Seq(("moved", "mv5")), s"got $afterMove")
    assert(IcebergishTable.read(spark, table).count() == 45) // no dup id
  }

  test("removeOrphans reclaims promote-then-crash leftovers; referenced and staged files survive") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-orph").toString + "/t"
    IcebergishTable.write(
      (0 until 8).map(i => (s"k$i", i.toLong)).toDF("k", "v"), table, "k", 4)
    val seed = IcebergishTable.snapshotFiles(
      table, IcebergishTable.currentSnapshot(table)).head
    val bucket = IcebergishTable.bucketOfPath(seed)
    def plantAged(rel: String): java.nio.file.Path = {
      val p = java.nio.file.Paths.get(table, rel)
      Files.createDirectories(p.getParent)
      Files.copy(java.nio.file.Paths.get(table, seed), p)
      Files.setLastModifiedTime(p, // simulated crash two hours ago
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7200000L))
      p
    }
    // An aged orphan (promoted, never committed), an aged STAGED file (a
    // writer's private area — never touched), and a fresh orphan (inside
    // the grace window of a possibly-mid-promote writer).
    val orphan = plantAged(s"data/part=$bucket/orphan-old.parquet")
    val staged = plantAged(s"data/_staging/batch-x/part=$bucket/in-flight.parquet")
    val fresh = java.nio.file.Paths.get(table, s"data/part=$bucket/orphan-new.parquet")
    Files.copy(java.nio.file.Paths.get(table, seed), fresh)

    val removed = IcebergishTable.removeOrphans(table, olderThanMs = 3600000L)
    assert(removed == Seq(s"data/part=$bucket/orphan-old.parquet"), removed)
    assert(!Files.exists(orphan))
    assert(Files.exists(staged) && Files.exists(fresh))
    // Every committed file untouched; reads unaffected.
    IcebergishTable.snapshotFiles(table, IcebergishTable.currentSnapshot(table))
      .foreach(f => assert(Files.exists(java.nio.file.Paths.get(table, f))))
    assert(IcebergishTable.read(spark, table).count() == 8)
  }

  test("slow-staged writes survive vacuum: promote restarts the grace clock") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-slowstage").toString + "/t"
    IcebergishTable.write(
      (0 until 8).map(i => (s"k$i", i.toLong)).toDF("k", "v"), table, "k", 4)
    val seed = IcebergishTable.snapshotFiles(
      table, IcebergishTable.currentSnapshot(table)).head
    val bucket = IcebergishTable.bucketOfPath(seed)
    // A writer that STAGED two hours ago (longer than the vacuum grace)
    // and only now promotes: Files.move preserves mtime, so without the
    // promote-time refresh its file would look expired the moment it
    // became vacuum-visible — a concurrent vacuum could reap it inside
    // the promote→commit window.
    val stagedRel = s"data/_staging/q-qslow/epoch-0/b$bucket-qqslow-e0-p0-t0.parquet"
    val staged = java.nio.file.Paths.get(table, stagedRel)
    Files.createDirectories(staged.getParent)
    Files.copy(java.nio.file.Paths.get(table, seed), staged)
    Files.setLastModifiedTime(staged,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))
    IcebergishTable.streamCommit(table, Seq((bucket, stagedRel)), "qslow", 0L)
    val promoted = java.nio.file.Paths.get(table,
      s"data/part=$bucket/b$bucket-qqslow-e0-p0-t0.parquet")
    assert(Files.exists(promoted))
    // Grace clock restarted: the promoted file's mtime is NOW, not the
    // two-hour-old staging time.
    assert(System.currentTimeMillis() -
      Files.getLastModifiedTime(promoted).toMillis < 300000L,
      "promote did not refresh mtime — vacuum grace starts in the past")
    // And a vacuum with the default grace leaves it (and all data) alone.
    assert(IcebergishTable.removeOrphans(table, olderThanMs = 3600000L).isEmpty)
    assert(Files.exists(promoted))
    assert(IcebergishTable.read(spark, table).count() == 9)
  }

  test("replace-type commits abort with CommitConflict when another writer lands first") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-cc2").toString + "/t"
    IcebergishTable.write(
      (0 until 8).map(i => (s"k$i", i.toLong)).toDF("k", "v"), table, "k", 4)
    val s0 = IcebergishTable.currentSnapshot(table)
    val seed = IcebergishTable.snapshotFiles(table, s0).head
    def plant(name: String): String = {
      val rel = s"data/part=${IcebergishTable.bucketOfPath(seed)}/$name"
      Files.copy(java.nio.file.Paths.get(table, seed),
        java.nio.file.Paths.get(table, rel))
      rel
    }
    // Pinned against s0, no intervening commit: succeeds.
    assert(IcebergishTable.commitAddedFiles(table, Seq(plant("cc-a.parquet")),
      expectedParent = Some(s0)) == s0 + 1)
    // Pinned against s0 AFTER another commit landed: typed abort — a
    // replace-all merge onto the unseen parent would drop cc-a.parquet.
    val planted = plant("cc-b.parquet")
    intercept[CommitConflict] {
      IcebergishTable.commitAddedFiles(table, Seq(planted),
        expectedParent = Some(s0))
    }
    assert(IcebergishTable.currentSnapshot(table) == s0 + 1) // nothing committed
  }

  test("schema evolution: addColumn widens the current schema, time travel keeps the old one") {
    import spark.implicits._
    import org.apache.spark.sql.types.StringType
    val table = Files.createTempDirectory("graft-ev").toString + "/t"
    IcebergishTable.write(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), table, "k", 4)
    val sOld = IcebergishTable.currentSnapshot(table)

    IcebergishTable.addColumn(table, "lang", StringType)
    val sEvolved = IcebergishTable.currentSnapshot(table)
    assert(sEvolved == sOld + 1) // metadata-only snapshot

    // Current read: widened schema, old rows read the new column as null.
    val cur = IcebergishTable.read(spark, table)
    assert(cur.columns.toSeq == Seq("k", "v", "lang", "part"))
    assert(cur.where(col("lang").isNull).count() == 2)

    // Append new-schema rows; both eras coexist in one read.
    IcebergishTable.write(Seq(("c", 3L, "en")).toDF("k", "v", "lang"),
      table, "k", 4, org.apache.spark.sql.SaveMode.Append)
    val all = IcebergishTable.read(spark, table)
      .select("k", "lang").as[(String, String)].collect().toSet
    assert(all == Set(("a", null), ("b", null), ("c", "en")))

    // A PRE-evolution writer (subset schema) still appends legally, and the
    // manifest keeps the WIDENED schema (no regression).
    IcebergishTable.write(Seq(("d", 4L)).toDF("k", "v"),
      table, "k", 4, org.apache.spark.sql.SaveMode.Append)
    val after = IcebergishTable.read(spark, table)
    assert(after.columns.toSeq == Seq("k", "v", "lang", "part"))
    assert(after.where(col("k") === "d" && col("lang").isNull).count() == 1)

    // A writer INVENTING a column is rejected typed, told to evolve first.
    val err = intercept[SchemaMismatch] {
      IcebergishTable.write(
        Seq(("e", 5L, "fr", 1.5)).toDF("k", "v", "lang", "score"),
        table, "k", 4, org.apache.spark.sql.SaveMode.Append)
    }
    assert(err.getMessage.contains("addColumn"))
    // …and a type-incompatible write is rejected too.
    intercept[SchemaMismatch] {
      IcebergishTable.write(Seq(("f", "not-a-long")).toDF("k", "v"),
        table, "k", 4, org.apache.spark.sql.SaveMode.Append)
    }

    // Time travel: the pre-evolution snapshot reads with the OLD schema.
    val old = IcebergishTable.readSnapshot(spark, table, sOld)
    assert(old.columns.toSeq == Seq("k", "v", "part"))
    assert(old.count() == 2)

    // Duplicate column addition is rejected typed.
    intercept[InvalidConfig] {
      IcebergishTable.addColumn(table, "LANG", StringType)
    }
  }

  test("appends onto a pre-versioned bucket layout (no bucket_fn) are refused") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-fn").toString + "/t"
    IcebergishTable.write(
      Seq(("a", 1L)).toDF("k", "v"), table, "k", 4)
    // Simulate a table committed by the pre-murmur3 layout: strip the
    // bucket_fn field from the current manifest.
    val snap = IcebergishTable.currentSnapshot(table)
    val m = java.nio.file.Paths.get(table, s"snap-$snap.json")
    val json = new String(Files.readAllBytes(m), "UTF-8")
      .replace(s""""bucket_fn":"${IcebergishTable.BucketFn}",""", "")
    Files.write(m, json.getBytes("UTF-8"))
    val err = intercept[BucketSpecMismatch] {
      IcebergishTable.write(Seq(("b", 2L)).toDF("k", "v"), table, "k", 4,
        org.apache.spark.sql.SaveMode.Append)
    }
    assert(err.getMessage.contains("bucket_fn"))
  }
}
