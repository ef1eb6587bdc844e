package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

/** Structured Streaming: custom state machine across micro-batches and
  * stream/batch equivalence of the windowed aggregation.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Long): Timestamp = new Timestamp(minute * 60000L)

  test("flatMapGroupsWithState sessionization emits closed sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStream.sessionize(input.toDS(), gapMs = 10 * 60000L)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_test").outputMode("append").start()
    try {
      // Batch 1: two events 5 min apart (same session), one other user.
      input.addData(
        Event(1, ts(0), 100L, "click", 1.0),
        Event(2, ts(5), 100L, "click", 2.0),
        Event(3, ts(0), 200L, "view", 5.0))
      q.processAllAvailable()
      assert(spark.table("sessions_test").count() == 0) // nothing closed yet

      // Batch 2: user 100 returns after 30 min → session 1 closes.
      input.addData(Event(4, ts(35), 100L, "click", 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_test").as[Session].collect()
      assert(closed.toSeq == Seq(Session(100L, ts(0), 2, 3.0)))

      // Batch 3: user 200 returns late → its first session closes too.
      input.addData(Event(5, ts(60), 200L, "view", 1.5))
      q.processAllAvailable()
      val all = spark.table("sessions_test").as[Session].collect().toSet
      assert(all == Set(Session(100L, ts(0), 2, 3.0), Session(200L, ts(0), 1, 5.0)))
    } finally q.stop()
  }

  test("streaming hourly window aggregation equals batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStream.hourlyCountsStreaming(spark, s"$dir/events.parquet")
      .collect().map(_.toSeq).toSet
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("append-mode file sink emits exactly the watermark-closed windows (production shape)") {
    import java.nio.file.Files
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    EventStream.hourlyCountsToFiles(spark, s"$dir/events.parquet", out, ckpt)
    val emitted = spark.read.parquet(out)
      .collect().map(_.toSeq).toSet
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .collect().map(_.toSeq).toSet
    // Append emits only windows the watermark closed: a subset of batch…
    assert(emitted.nonEmpty && emitted.subsetOf(batch),
      s"emitted ${emitted.size} rows, batch ${batch.size}")
    // …and complete below the final watermark (max ts − 1h delay − 1h width).
    val maxTs = spark.read.parquet(s"$dir/events.parquet")
      .agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0).getTime
    val closedBound = maxTs - 2 * 3600 * 1000L
    val missing = batch.filter(r =>
      r.head.asInstanceOf[java.time.LocalDateTime]
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli < closedBound) -- emitted
    assert(missing.isEmpty, s"closed windows not emitted: $missing")
  }

  test("readStream.table over the DSv2 catalog follows snapshots exactly-once") {
    import java.nio.file.Files
    import spark.implicits._
    import graft.io.IcebergishTable
    val base = Files.createTempDirectory("graft-mbs").toString
    val table = s"$base/edges"
    val ckpt = s"$base/ckpt"
    val saved = Seq("spark.sql.catalog.graft_s", "spark.sql.catalog.graft_s.warehouse")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.catalog.graft_s",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_s.warehouse", base)
    try {
      graft.streaming.StreamingKg.appendBatch(
        Seq(Triple("A", "p", "B", "u1", 1.0),
          Triple("C", "p", "D", "u2", 1.0)).toDF, table, 0L, 4)

      val out = s"$base/out"
      def drain(): Set[String] = {
        val q = spark.readStream.table("graft_s.edges")
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.read.parquet(out).select("subj").as[String].collect().toSet
      }
      // First run consumes everything committed so far.
      assert(drain() == Set("A", "C"))
      // No new snapshot → a restarted stream emits nothing new.
      assert(drain() == Set("A", "C"))
      // Two more committed snapshots → exactly their rows arrive, once.
      graft.streaming.StreamingKg.appendBatch(
        Seq(Triple("E", "p", "F", "u3", 1.0)).toDF, table, 1L, 4)
      graft.streaming.StreamingKg.appendBatch(
        Seq(Triple("G", "p", "H", "u4", 1.0)).toDF, table, 2L, 4)
      val all = drain()
      assert(all == Set("A", "C", "E", "G"), s"got $all")
      // Global dedup sanity: 4 rows total, not 4 + replays.
      assert(spark.read.parquet(out).count() == 4)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("admission control: a backlog of snapshots drains in multiple capped micro-batches, exactly-once") {
    import java.nio.file.Files
    import spark.implicits._
    val base = Files.createTempDirectory("graft-mbs-ac").toString
    val table = s"$base/edges"
    val saved = Seq("spark.sql.catalog.graft_ac", "spark.sql.catalog.graft_ac.warehouse")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.catalog.graft_ac",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ac.warehouse", base)
    try {
      // Downtime backlog: four committed snapshots before the stream starts.
      (0 until 4).foreach { i =>
        graft.streaming.StreamingKg.appendBatch(
          Seq(Triple(s"S$i", "p", s"O$i", s"u$i", 1.0)).toDF, table, i.toLong, 4)
      }
      val out = s"$base/out"
      val q = spark.readStream
        .option("maxSnapshotsPerTrigger", "1")
        .table("graft_ac.edges")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // Exactly-once totals across the split batches…
      val got = spark.read.parquet(out).select("subj").as[String].collect()
      assert(got.sorted.toSeq == Seq("S0", "S1", "S2", "S3"), s"got ${got.toSeq}")
      // …and the backlog was NOT one giant batch: one data batch per
      // snapshot (the progress log records each micro-batch's row count).
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 4,
        s"expected 4 capped micro-batches, got $dataBatches: " +
          q.recentProgress.map(_.numInputRows).mkString(","))

      // maxFilesPerTrigger variant over the same table: 4 snapshots × 1
      // file each with a budget of 2 files per trigger → 2 data batches.
      val out2 = s"$base/out2"
      val q2 = spark.readStream
        .option("maxFilesPerTrigger", "2")
        .table("graft_ac.edges")
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", s"$base/ckpt2")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      assert(spark.read.parquet(out2).count() == 4)
      val dataBatches2 = q2.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches2 == 2,
        s"expected 2 file-capped micro-batches, got $dataBatches2: " +
          q2.recentProgress.map(_.numInputRows).mkString(","))
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("writeStream.toTable: native DSv2 streaming sink appends exactly-once") {
    import java.nio.file.Files
    import spark.implicits._
    import graft.io.IcebergishTable
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-ssw").toString
    val table = s"$base/sink"
    val saved = Seq("spark.sql.catalog.graft_w", "spark.sql.catalog.graft_w.warehouse")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.catalog.graft_w",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_w.warehouse", base)
    try {
      IcebergishTable.createEmpty(table,
        Seq(Triple("A", "p", "B", "u", 1.0)).toDF.schema, "subj", 4)

      val input = MemoryStream[Triple]
      val q = input.toDF.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .toTable("graft_w.sink")
      try {
        input.addData(Triple("A", "p", "B", "u1", 1.0),
          Triple("C", "p", "D", "u2", 1.0))
        q.processAllAvailable()
        input.addData(Triple("E", "p", "F", "u3", 1.0))
        q.processAllAvailable()
      } finally q.stop()

      // All three rows, once each — readable via the bespoke reader AND the
      // catalog, with the bucket layout intact (storage-partitioned reads).
      val got = IcebergishTable.read(spark, table)
        .select("subj").as[String].collect().toSeq.sorted
      assert(got == Seq("A", "C", "E"), s"got $got")
      assert(spark.table("graft_w.sink").count() == 3)
      val hubPart = Seq(("A", 1)).toDF("k", "v")
        .select(IcebergishTable.partExpr("k", 4)).head().getInt(0)
      assert(Files.exists(java.nio.file.Paths.get(
        s"$table/data/part=$hubPart")), "bucket dirs not created")

      // Exactly-once: the manifest recorded the query's epoch high-water;
      // a replayed (older) epoch discards its staged files and commits
      // nothing.
      val epochs = IcebergishTable.manifestEpochs(table)
      assert(epochs.size == 1 && epochs.head._2 >= 1, s"epochs $epochs")
      val qid = epochs.head._1
      val snapBefore = IcebergishTable.currentSnapshot(table)
      val staged = java.nio.file.Paths.get(
        s"$table/data/_staging/q-$qid/epoch-0/b0-p0-t99.parquet")
      Files.createDirectories(staged.getParent)
      Files.write(staged, Array[Byte](1, 2, 3))
      IcebergishTable.streamCommit(table,
        Seq((0, s"data/_staging/q-$qid/epoch-0/b0-p0-t99.parquet")), qid, 0L)
      assert(!Files.exists(staged), "replayed epoch's staged file not discarded")
      assert(IcebergishTable.currentSnapshot(table) == snapBefore,
        "replayed epoch committed a snapshot")
      assert(IcebergishTable.read(spark, table).count() == 3)

      // Staging tree is swept after commits — no hidden-file accumulation.
      val stagingRoot = java.nio.file.Paths.get(s"$table/data/_staging/q-$qid")
      assert(!Files.exists(stagingRoot) ||
        !Files.list(stagingRoot).iterator().hasNext)

      // Restart the query from the SAME checkpoint: the new run must pick
      // up where the old one stopped — no duplicated batches, and new data
      // arrives exactly once through the restarted sink. (MemoryStream is
      // not durable, so the replacement stream re-contains the committed
      // batches — the restarted query must skip them, not re-append.)
      val input2 = MemoryStream[Triple]
      input2.addData(Triple("A", "p", "B", "u1", 1.0),
        Triple("C", "p", "D", "u2", 1.0))
      input2.addData(Triple("E", "p", "F", "u3", 1.0))
      val q2 = input2.toDF.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .toTable("graft_w.sink")
      try {
        input2.addData(Triple("G", "p", "H", "u4", 1.0))
        q2.processAllAvailable()
      } finally q2.stop()
      val after = IcebergishTable.read(spark, table)
        .select("subj").as[String].collect().toSeq.sorted
      assert(after == Seq("A", "C", "E", "G"), s"after restart: $after")
    } finally {
      // finally, not tail-of-try: a failed assert must not leak the
      // graft_w catalog registration into the shared session.
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("session_window batch operator groups by inactivity gap") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 1L, "a", 1.0),
      (2L, ts(10), 1L, "a", 1.0),   // same session (10 min gap < 6h)
      (3L, ts(60 * 10), 1L, "a", 1.0), // 10h later → new session
      (4L, ts(0), 2L, "b", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStream.sessionWindows(events, gap = "6 hours")
      // session_start is NTZ on the way out (oracle-format contract);
      // cast back for the Timestamp-based assertion (UTC session: no-op).
      .select(col("user_id"), col("session_start").cast("timestamp"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(out == Set((1L, ts(0), 2L), (1L, ts(600), 1L), (2L, ts(0), 1L)))
  }
}
