package graft.materialize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CheckpointRow
import graft.io.IcebergishTable

/** Thrown by the test-only fault injector to simulate a mid-job crash. */
final class SimulatedFailure(msg: String) extends RuntimeException(msg)

/** Graph materialization with per-partition checkpointed, idempotent writes
  * (SURVEY.md §7.2 #8).
  *
  * Output tables are hash-bucketed [[IcebergishTable]]s. Buckets are written
  * in groups; after each group's files are durable, one [[CheckpointRow]]
  * per bucket (with lineage: input fingerprint, row count, wall ms) is
  * appended. A re-run with the same (runId, stage) anti-joins pending
  * buckets against completed checkpoint rows and recomputes only those —
  * the reference's resumable batch-ack cursor re-expressed
  * (/root/reference/src/sharding.rs:237-271).
  */
object GraphOut {

  final case class WriteStats(partsWritten: Seq[Int], partsSkipped: Seq[Int],
                              rowsWritten: Long)

  /** Acked buckets whose on-disk data still matches the acked fingerprint.
    *
    * An ack row records `bit_xor(xxhash64(key))` of the bucket as written;
    * on resume we recompute it from the table (a column-pruned scan of the
    * key column over the acked buckets only) and demote any mismatch to
    * pending — a tampered or partially-deleted bucket recomputes instead of
    * silently surviving. The reference's ack is implicitly bound
    * to one dump context the same way (/root/reference/src/sharding.rs:
    * 86-137). First runs skip the scan entirely (no acks yet).
    */
  private def verifiedDoneParts(spark: SparkSession, table: String,
                                keyCol: String, ckptPath: String,
                                runId: String, stage: String,
                                inputTag: String): Set[Int] = {
    val rows = Checkpoint.readRows(ckptPath)
      .filter(r => r.run_id == runId && r.stage == stage &&
        r.status == "done" && r.input_tag == inputTag)
    if (rows.isEmpty || !IcebergishTable.exists(table)) return Set.empty
    val expected: Map[Int, String] =
      rows.groupBy(_.part).view.mapValues(_.last.input_fingerprint).toMap
    val done = expected.keySet
    // A table with NO data files at all (zero-row run, or a wholesale
    // delete behind the checkpoint's back) must not crash schema inference:
    // verify against an empty read-back — zero-row acks (fp "0") stay done,
    // anything else demotes to pending and recomputes.
    if (IcebergishTable.hasNoDataFiles(table))
      return done.filter(p => expected(p) == "0")
    // Tamper-tolerant read: a deleted acked file must surface as a
    // fingerprint mismatch below (→ demote to pending and recompute),
    // not abort the verification with a missing-path error.
    val actual = IcebergishTable.readVerification(spark, table)
      .where(col(IcebergishTable.PartCol).isin(done.toSeq: _*))
      .groupBy(col(IcebergishTable.PartCol))
      .agg(coalesce(expr(s"bit_xor(xxhash64($keyCol))"), lit(0L)).as("fp"))
      .collect()
      .map(r => r.getInt(0) -> java.lang.Long.toHexString(r.getLong(1)))
      .toMap
    done.filter(p => actual.getOrElse(p, "0") == expected(p))
  }

  /** Shared grouped-write core: for each group of pending buckets, build the
    * group's pre-partitioned plan, clear the group's (possibly stale) bucket
    * dirs, write, then ack with lineage. `plan(group)` must return
    * a DataFrame already exchange-partitioned on [[IcebergishTable.PartCol]]
    * (each task holds exactly one bucket).
    *
    * Lineage (per-bucket row count + order-insensitive key fingerprint)
    * rides the WRITE JOB itself via `observe` — one pair of builtin
    * aggregates per bucket (`sum(when(part=p,1))`,
    * `bit_xor(when(part=p, xxhash64(key)) else 0)`; the extra zeros are
    * xor-identity) collected by a CollectMetrics node as the rows stream
    * into the files. This removed the post-write read-back scan that used
    * to cost a second (pruned) pass over every fresh file per group —
    * measured as the dominant per-build fixed cost at 300k pages.
    */
  private def writeGrouped(
      spark: SparkSession, table: String, keyCol: String, numParts: Int,
      ckptPath: String, runId: String, stage: String, groupSize: Int,
      inputTag: String, failAfterGroups: Int = -1)
      (plan: Seq[Int] => DataFrame): WriteStats = {
    val done = verifiedDoneParts(spark, table, keyCol, ckptPath, runId,
      stage, inputTag)
    val all = (0 until numParts).toSeq
    val pending = all.filterNot(done)

    def timed[T](name: String)(f: => T): T =
      if (sys.env.contains("GRAFT_TIMING")) {
        val t = System.nanoTime()
        val r = f
        System.err.println(
          f"[timing]   $stage/$name%-14s ${(System.nanoTime() - t) / 1e9}%.3f s")
        r
      } else f

    var written = 0L
    var groups = 0
    pending.grouped(groupSize).foreach { group =>
      if (failAfterGroups >= 0 && groups >= failAfterGroups)
        throw new SimulatedFailure(
          s"injected failure after $groups groups (stage=$stage)")
      val t0 = System.nanoTime()
      val obs = org.apache.spark.sql.Observation(
        s"lineage-$stage-${group.head}-${java.util.UUID.randomUUID}")
      val part = col(IcebergishTable.PartCol)
      val metricCols = group.flatMap { p =>
        Seq(
          sum(when(part === p, 1L).otherwise(0L)).as(s"n_$p"),
          expr(s"bit_xor(CASE WHEN ${IcebergishTable.PartCol} = $p " +
            s"THEN xxhash64($keyCol) ELSE 0L END)").as(s"fp_$p"))
      }
      val deduped = plan(group)
        .observe(obs, metricCols.head, metricCols.tail: _*)
      // replaceParts = the WHOLE group: writePrePartitioned clears the
      // group's (possibly stale) bucket dirs itself before promoting, and
      // a rewritten bucket that came out empty still leaves the parent
      // manifest.
      timed("write")(
        IcebergishTable.writePrePartitioned(deduped, table, numParts, keyCol,
          replaceParts = group))
      val wallMs = (System.nanoTime() - t0) / 1000000L
      // Aggregates over an entirely empty group plan come back null.
      val m = timed("lineage-metrics")(obs.get)
      def asLong(v: Any): Long = v match {
        case null => 0L
        case l: java.lang.Long => l.longValue
        case other => other.toString.toLong
      }
      val rows = group.map { p =>
        val n = asLong(m.getOrElse(s"n_$p", 0L))
        val fp = if (n == 0L) 0L else asLong(m.getOrElse(s"fp_$p", 0L))
        written += n
        CheckpointRow(runId, stage, p, inputTag,
          java.lang.Long.toHexString(fp), n, n, wallMs, "done")
      }
      timed("ack-append")(Checkpoint.append(spark, ckptPath, rows))
      groups += 1
    }
    WriteStats(pending, all.filter(done), written)
  }

  /** Write `df` into `table`, bucketed on `keyCol` into `numParts` buckets,
    * `groupSize` buckets per commit. `failAfterGroups >= 0` injects a crash
    * after that many committed groups (tests only).
    *
    * The general path shares [[writeGrouped]]'s observe-lineage mechanism
    * with the hot path: per-bucket counts + fingerprints ride the write job
    * itself (CollectMetrics) — no separate pre-write stats aggregation and
    * collect. The only difference from [[writeBucketedDedup]] is the plan:
    * a plain bucket-aligned repartition, no dedup aggregate.
    */
  def writeWithCheckpoint(
      df: DataFrame,
      table: String,
      keyCol: String,
      numParts: Int,
      ckptPath: String,
      runId: String,
      stage: String,
      groupSize: Int = 8,
      failAfterGroups: Int = -1,
      inputTag: String = "static"
  ): WriteStats = {
    val withPart = df.withColumn(IcebergishTable.PartCol,
      IcebergishTable.partExpr(keyCol, numParts))
    writeGrouped(df.sparkSession, table, keyCol, numParts, ckptPath, runId,
      stage, groupSize, inputTag, failAfterGroups) { group =>
      // Aligned repartition on the KEY: partition id = pmod(murmur3(key),
      // numParts) = bucket, so each task holds exactly one whole bucket
      // (see bucketedDedupPlanAligned).
      withPart.where(col(IcebergishTable.PartCol).isin(group: _*))
        .repartition(numParts, col(keyCol))
    }
  }

  /** Single-shuffle bucketed write with in-shuffle dedup (the 100 TB hot
    * path): ONE exchange on the bucket column; rows are sorted within each
    * bucket on the dedup key by the shuffle's spill-safe sort machinery and
    * de-duplicated with an O(1)-memory adjacent filter; each task then holds
    * exactly one bucket, so `partitionBy` emits one file per bucket with no
    * further repartition.
    *
    * vs [[writeWithCheckpoint]] (general path): saves one exchange, one
    * full-data aggregation pass, and the intermediate checkpoint
    * materialization.
    */
  def writeBucketedDedup(
      df: DataFrame,
      table: String,
      keyCol: String,
      numParts: Int,
      dedupCols: Seq[String],
      ckptPath: String,
      runId: String,
      stage: String,
      groupSize: Int = 64,
      inputTag: String = "static",
      skewSalt: Int = 1
  ): WriteStats = {
    val withPart = df.withColumn(IcebergishTable.PartCol,
      IcebergishTable.partExpr(keyCol, numParts))
    writeGrouped(df.sparkSession, table, keyCol, numParts, ckptPath, runId,
      stage, groupSize, inputTag) { group =>
      val scoped = withPart.where(col(IcebergishTable.PartCol).isin(group: _*))
      if (skewSalt <= 1)
        bucketedDedupPlanAligned(scoped, numParts, keyCol, dedupCols)
      else
        bucketedDedupPlanAlignedSalted(scoped, numParts, dedupCols, skewSalt)
    }
  }

  /** The single-exchange dedup plan (exposed for plan assertions): input
    * must already carry `PartCol`. Repartition on the bucket column, then
    * group by (part ++ dedupCols) — the child's HashPartitioning on `part`
    * is a SUBSET of the grouping keys, so it satisfies the aggregation's
    * clustering requirement and Catalyst plans the dedup as an in-partition
    * HashAggregate with NO second exchange, fully codegen'd (spill-safe via
    * the sort-agg fallback).
    */
  def bucketedDedupPlan(withPart: DataFrame, shuffleParts: Int,
                        dedupCols: Seq[String]): DataFrame =
    bucketedDedupPlan(withPart, shuffleParts, dedupCols, 1)

  /** Bucket-ALIGNED single-exchange dedup (the hot-path default): because
    * [[IcebergishTable.partExpr]] is pmod(murmur3(key), n) — the exact
    * expression HashPartitioning uses for partition ids — repartitioning on
    * the KEY into exactly `numParts` partitions makes shuffle partition i
    * hold precisely bucket i: every reduce task is one whole bucket,
    * non-empty and balanced (vs hashing 32 bucket VALUES into 64 slots,
    * where birthday collisions gave some tasks 2-3 buckets and half none —
    * measured p50 36 ms / max 6.4 s at 300k pages). The dedup agg still
    * plans in-partition: `key` ∈ dedupCols ⊆ grouping keys.
    */
  def bucketedDedupPlanAligned(withPart: DataFrame, numParts: Int,
                               keyCol: String,
                               dedupCols: Seq[String]): DataFrame = {
    require(dedupCols.contains(keyCol),
      s"aligned dedup requires the bucket key '$keyCol' among dedup columns")
    dedupGroups(withPart.repartition(numParts, col(keyCol)),
      withPart.columns, Seq.empty, dedupCols)
  }

  /** Shared in-partition dedup aggregate over (part ++ extraKeys ++
    * dedupCols); preserves the input column order.
    */
  private def dedupGroups(sub: DataFrame, allCols: Seq[String],
                          extraKeys: Seq[String],
                          dedupCols: Seq[String]): DataFrame = {
    val keyCols = (IcebergishTable.PartCol +: extraKeys) ++ dedupCols
    val restCols = allCols.filterNot(keyCols.contains)
    val grouped =
      if (restCols.isEmpty)
        sub.groupBy(keyCols.map(col): _*).agg(count(lit(1))).drop("count(1)")
      else {
        // max, not first: first() is arrival-order-dependent, so two
        // duplicate rows differing only in a non-key column would flap
        // across runs/parallelism. max is order-free and deterministic.
        val aggs = restCols.map(c => max(col(c)).as(c))
        sub.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
    grouped.select(allCols.map(col).toIndexedSeq: _*)
  }

  /** `skewSalt > 1` splits each bucket over `skewSalt` shuffle sub-keys for
    * hub-entity skew (north_rule: one entity in 50% of pages lands half the
    * edge table in ONE bucket — with salt=1 that bucket is a single
    * straggler task). The salt is a pure function of the dedup key, so
    * duplicate rows still meet in one task and the dedup stays exact; the
    * salt column joins the grouping keys (functionally redundant, but it
    * lets the child's (part, salt) HashPartitioning satisfy the
    * aggregation's clustering — still exactly ONE exchange). Cost: up to
    * `skewSalt` files per bucket instead of one.
    */
  def bucketedDedupPlan(withPart: DataFrame, shuffleParts: Int,
                        dedupCols: Seq[String], skewSalt: Int): DataFrame = {
    if (skewSalt <= 1 || dedupCols.isEmpty) {
      val sub = withPart.repartition(shuffleParts, col(IcebergishTable.PartCol))
      if (dedupCols.isEmpty) sub
      else dedupGroups(sub, withPart.columns, Seq.empty, dedupCols)
    } else {
      val saltCol = "_wsalt"
      val salted = withPart.withColumn(saltCol,
        pmod(xxhash64(dedupCols.map(col): _*), lit(skewSalt)).cast("int"))
      val sub = salted.repartition(shuffleParts,
        col(IcebergishTable.PartCol), col(saltCol))
      dedupGroups(sub, withPart.columns, Seq(saltCol), dedupCols)
    }
  }

  /** Ints whose Spark-HashPartitioning partition id (pmod(murmur3(x), m))
    * covers 0..m-1 exactly once: `inverseHashSlots(m)(s)` lands in shuffle
    * slot `s`. Brute search, ~m·ln(m) murmur evaluations driver-side —
    * microseconds at file-layout scale (m ≤ 10³).
    */
  private[graft] def inverseHashSlots(m: Int): Array[Int] = {
    val out = new Array[Int](m)
    val found = new Array[Boolean](m)
    var remaining = m
    var x = 0
    while (remaining > 0) {
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(x, org.apache.spark.sql.types.IntegerType, 42L).toInt
      val id = ((h % m) + m) % m
      if (!found(id)) { found(id) = true; out(id) = x; remaining -= 1 }
      x += 1
    }
    out
  }

  /** Bucket-aligned SALTED single-exchange dedup: each of the
    * `numParts × skewSalt` (bucket, salt) slices becomes exactly ONE
    * shuffle partition — even, non-empty reduce tasks like
    * [[bucketedDedupPlanAligned]], but with hub buckets split `skewSalt`
    * ways.
    *
    * Alignment trick: HashPartitioning can't be told "partition id =
    * part·salt + wsalt" directly, and hashing (part, wsalt) into m slots
    * collides birthday-style (measured occ 82% / p50 43 ms vs the aligned
    * plan's one-whole-bucket tasks). Instead we shuffle on a synthetic int
    * column looked up from [[inverseHashSlots]]: a literal array whose
    * entry for slot s is an int that murmur3-hashes TO s. The salt stays a
    * pure function of the dedup key (duplicates still meet), and the slot
    * column joins the grouping keys so the child's HashPartitioning
    * satisfies the aggregation — still exactly ONE exchange.
    */
  def bucketedDedupPlanAlignedSalted(withPart: DataFrame, numParts: Int,
                                     dedupCols: Seq[String],
                                     skewSalt: Int): DataFrame = {
    require(dedupCols.nonEmpty, "salted dedup requires dedup columns")
    val m = numParts * skewSalt
    val saltCol = "_wsalt"
    val slotCol = "_wslot"
    val lookup = inverseHashSlots(m)
    val salted = withPart
      .withColumn(saltCol,
        pmod(xxhash64(dedupCols.map(col): _*), lit(skewSalt)).cast("int"))
      .withColumn(slotCol, element_at(
        typedLit(lookup.toSeq),
        col(IcebergishTable.PartCol) * skewSalt + col(saltCol) + 1))
    val sub = salted.repartition(m, col(slotCol))
    dedupGroups(sub, withPart.columns, Seq(slotCol, saltCol), dedupCols)
  }

  /** Vertex table from canonical triples: every subject/object id with its
    * triple-degree as a property.
    */
  def vertices(triples: DataFrame): DataFrame = {
    val ids = triples.select(col("subj").as("id"))
      .union(triples.select(col("obj").as("id")))
    ids.groupBy(col("id"))
      .agg(count(lit(1)).as("degree"))
      .select(
        col("id"),
        lit("entity").as("label"),
        map(lit("degree"), col("degree").cast("string")).as("props"))
  }

  /** Single-exchange vertex derivation (exposed for plan assertions): the
    * endpoint-id union exchanges ONCE on the bucket column; the degree
    * count then runs as an in-partition HashAggregate on (part, id) — the
    * child HashPartitioning on `part` is a subset of the grouping keys, so
    * no second exchange is planned. Halves the old vertex path's shuffles
    * (groupBy(id) exchange + bucket repartition → one bucket exchange).
    */
  def verticesBucketedPlan(triples: DataFrame, numParts: Int,
                           parts: Option[Seq[Int]] = None): DataFrame = {
    // explode(array(subj, obj)), not union of two projections: the union
    // form executes BOTH children — two full scans of the edge table for
    // one endpoint pass. The generator emits the identical id multiset
    // (one subj + one obj per triple) from a single scan; PlanSpec pins
    // result equality against the reference vertices() operator.
    val ids = triples
      .select(explode(array(col("subj"), col("obj"))).as("id"))
      .withColumn(IcebergishTable.PartCol,
        IcebergishTable.partExpr("id", numParts))
    // Bucket filter BEFORE the exchange: a resume with few pending buckets
    // only shuffles those buckets' ids.
    val scoped = parts.fold(ids)(p =>
      ids.where(col(IcebergishTable.PartCol).isin(p: _*)))
    // Repartition on the KEY into exactly numParts partitions: partition id
    // = pmod(murmur3(id), n) = part (see IcebergishTable.partExpr), so each
    // reduce task holds exactly one whole bucket — even tasks, no
    // bucket-into-slot hash collisions. `id` ∈ grouping keys keeps the
    // degree aggregate in-partition (one exchange total).
    scoped.repartition(numParts, col("id"))
      .groupBy(col(IcebergishTable.PartCol), col("id"))
      .agg(count(lit(1)).as("degree"))
      .select(
        col("id"),
        lit("entity").as("label"),
        map(lit("degree"), col("degree").cast("string")).as("props"),
        col(IcebergishTable.PartCol))
  }

  /** Checkpointed vertex write straight from the (already canonical) edge
    * table — the fused path used by `Pipeline.build`.
    */
  def writeVerticesBucketed(
      triples: DataFrame,
      table: String,
      numParts: Int,
      ckptPath: String,
      runId: String,
      stage: String,
      groupSize: Int = 64,
      inputTag: String = "static"
  ): WriteStats =
    writeGrouped(triples.sparkSession, table, "id", numParts, ckptPath,
      runId, stage, groupSize, inputTag) { group =>
      verticesBucketedPlan(triples, numParts, Some(group))
    }
}
