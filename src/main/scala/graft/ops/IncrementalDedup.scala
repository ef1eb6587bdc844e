package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.io.IcebergishTable

/** Incremental MinHash-LSH dedup: process a corpus in arriving batches
  * against a PERSISTED signature table, so each batch's cost is
  * O(batch × matches) instead of re-sketching the whole corpus — the shape
  * a training-data pipeline actually runs when a crawl lands daily.
  *
  * Per batch: sketch the new docs (same shingle→minhash→band pipeline as
  * [[Dedup.minhashLshPairs]]), candidate-join the new band buckets against
  * new ∪ committed buckets (never old×old — those pairs were emitted by
  * earlier batches), verify candidates by exact fingerprint-set jaccard,
  * then commit the new signatures to the state table. The state is an
  * [[IcebergishTable]] bucketed by id: appends are atomic snapshots, so a
  * crashed batch never half-publishes, and a REPLAYED batch converges —
  * ids already committed are anti-joined out, emitting zero new pairs and
  * appending nothing (exactly-once by doc id without an external ack log).
  *
  * Union of emitted pairs over any batch split ≡ the single-shot
  * [[Dedup.minhashLshPairs]] run on the whole corpus (spec-asserted, and
  * `dedup_incremental` puts a 3-batch split under the brute-force jaccard
  * DuckDB oracle): a cross-batch pair (a ∈ batch_i, b ∈ batch_j, j < i)
  * shares the same band keys it would in the full run, so it surfaces as a
  * candidate exactly when batch_i lands.
  *
  * Scale: the batch side of the candidate join is small (one delivery) and
  * AQE-broadcasts; the state side explodes only (id, band, key) — 16
  * bytes/band — never text or fingerprint arrays. The verify join ships
  * fingerprint arrays for CANDIDATE ids only. State reads are columnar and
  * prune to the three signature columns; state growth is plain table
  * growth, reclaimable with the existing compact/expire machinery.
  */
object IncrementalDedup {

  // ONE definition of every tuning default, shared by the three entry
  // points below: replay convergence (a crash-window re-run computing the
  // IDENTICAL pair set) depends on the replayer using the same sketch
  // parameters as the original run — per-signature duplicated defaults
  // could drift one-sidedly and silently break that invariant.
  private val DefaultStateBuckets = 16
  private val DefaultPairsBuckets = 4
  private val DefaultW = 3
  private val DefaultNumHashes = 128
  private val DefaultRowsPerBand = 2
  private val DefaultMinJaccard = 0.5

  /** Process one batch; returns the verified near-dup pairs this batch
    * adds: (ia, ib, jaccard) with ia < ib, at least one side new.
    *
    * Batches must be processed SERIALLY per state table (the reality of a
    * daily-crawl pipeline): two batches processed CONCURRENTLY would each
    * read a state missing the other, so a cross-pair between them could
    * surface in neither — the appends themselves merge safely (multi-
    * writer commit CAS), but pair completeness needs the read-compare-
    * append cycle to be serialized by the caller.
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
                   stateTable: String, stateBuckets: Int = DefaultStateBuckets,
                   w: Int = DefaultW, numHashes: Int = DefaultNumHashes,
                   rowsPerBand: Int = DefaultRowsPerBand,
                   minJaccard: Double = DefaultMinJaccard): DataFrame = {
    val (pairs, fresh, hasState) = computeBatch(batch, idCol, textCol,
      stateTable, w, numHashes, rowsPerBand, minJaccard)
    commitState(fresh, stateTable, stateBuckets, hasState)
    pairs
  }

  /** One batch's computation WITHOUT committing anything: (verified pairs,
    * persisted fresh-signature frame, whether state already exists). The
    * caller MUST pass `fresh` to [[commitState]] (which also unpersists) —
    * split out so the streaming sink can interleave its own pairs append
    * between computation and the state commit.
    */
  private def computeBatch(batch: DataFrame, idCol: String, textCol: String,
                           stateTable: String, w: Int, numHashes: Int,
                           rowsPerBand: Int, minJaccard: Double)
      : (DataFrame, DataFrame, Boolean) = {
    val spark = batch.sparkSession
    import spark.implicits._
    // Shared sketch pipeline (Dedup.minhashSignatureFrame): the batch-union
    // ≡ single-shot invariant depends on the sketch being literally the
    // same code as minhashLshPairs', not a copy.
    val newSigs = Dedup.minhashSignatureFrame(batch, idCol, textCol,
      w, numHashes, rowsPerBand)

    val hasState = IcebergishTable.currentSnapshot(stateTable) >= 0
    val oldSigs =
      if (hasState)
        IcebergishTable.read(spark, stateTable)
          .select(col("id"), col("sh"), col("bandKeys"))
      else
        spark.emptyDataset[(Long, Seq[Long], Seq[Long])]
          .toDF("id", "sh", "bandKeys")

    // Replay protection: ids already committed are not re-sketched into
    // state and emit no pairs — a re-delivered batch is a no-op.
    val fresh = newSigs
      .join(oldSigs.select(col("id")), Seq("id"), "left_anti")
      // Consumed by bucket join (2 sides), verify join, and the state
      // append: sketch each doc once.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bNew = fresh.select(col("id"),
      posexplode(col("bandKeys")).as(Seq("band", "key")))
    val bAll = bNew.union(oldSigs.select(col("id"),
      posexplode(col("bandKeys")).as(Seq("band", "key"))))
    // New×(new ∪ old): the left side is always fresh, so old×old pairs
    // (already emitted by the batch that made them new) cannot reappear.
    val cand = bNew.toDF("a", "band", "key")
      .join(bAll.toDF("b", "band", "key"), Seq("band", "key"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("ia"),
        greatest(col("a"), col("b")).as("ib"))
      .distinct()

    val allSh = fresh.select(col("id"), col("sh"))
      .union(oldSigs.select(col("id"), col("sh")))
    // Shared verify (Dedup.jaccardVerify) — same rounding/threshold code
    // path as the single-shot operator, same oracle.
    val out = Dedup.jaccardVerify(cand, allSh, minJaccard)
    // Materialize pairs BEFORE the state append: the returned frame must
    // not lazily recompute against a state that now contains this batch
    // (every fresh id would self-candidate against its committed copy).
    val pairs = out.localCheckpoint()
    (pairs, fresh, hasState)
  }

  private def commitState(fresh: DataFrame, stateTable: String,
                          stateBuckets: Int, hasState: Boolean): Unit = {
    if (fresh.limit(1).count() > 0)
      IcebergishTable.write(fresh.select(col("id"), col("sh"), col("bandKeys")),
        stateTable, "id", stateBuckets,
        if (hasState) SaveMode.Append else SaveMode.Overwrite)
    fresh.unpersist(blocking = false)
  }

  /** Streaming incremental dedup: every micro-batch of documents runs the
    * batch computation against the shared state table, appends its NEW
    * pairs into an Icebergish pairs table, then commits the batch's
    * signatures — `readStream → foreachBatch` over the same core as
    * [[processBatch]].
    *
    * NET-EXACTLY-ONCE without a distributed transaction: the pairs append
    * is an anti-join against the pairs table's committed (ia, ib) state
    * (the StreamingKg cross-batch-dedup pattern), and the state append
    * carries the committed-id anti-join. Whichever crash window a replay
    * lands in — before the pairs append, between the two appends, or
    * after both — re-running the batch converges to the identical final
    * tables: already-appended pairs anti-join away, already-committed ids
    * emit nothing, and both appends are atomic snapshots.
    */
  def streamIntoTables(docs: DataFrame, idCol: String, textCol: String,
                       stateTable: String, pairsTable: String,
                       checkpointDir: String,
                       stateBuckets: Int = DefaultStateBuckets,
                       pairsBuckets: Int = DefaultPairsBuckets,
                       w: Int = DefaultW, numHashes: Int = DefaultNumHashes,
                       rowsPerBand: Int = DefaultRowsPerBand,
                       minJaccard: Double = DefaultMinJaccard,
                       trigger: org.apache.spark.sql.streaming.Trigger =
                         org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(batch, idCol, textCol, stateTable, pairsTable,
          stateBuckets, pairsBuckets, w, numHashes, rowsPerBand, minJaccard)
      }
      .trigger(trigger)
      .start()

  /** The per-micro-batch unit of [[streamIntoTables]] (also the replay
    * unit the spec exercises directly): compute → converging pairs append
    * → state commit, in that order (see the crash-window analysis above).
    */
  private[graft] def appendBatch(batch: DataFrame, idCol: String,
                                 textCol: String, stateTable: String,
                                 pairsTable: String,
                                 stateBuckets: Int = DefaultStateBuckets,
                                 pairsBuckets: Int = DefaultPairsBuckets,
                                 w: Int = DefaultW,
                                 numHashes: Int = DefaultNumHashes,
                                 rowsPerBand: Int = DefaultRowsPerBand,
                                 minJaccard: Double = DefaultMinJaccard): Unit = {
    val spark = batch.sparkSession
    val (pairs, fresh, hasState) = computeBatch(batch, idCol, textCol,
      stateTable, w, numHashes, rowsPerBand, minJaccard)
    // Tracked outside the if/else so the finally can free it: the
    // anti-joined frame is localCheckpoint'd per micro-batch, and a
    // long-running stream would otherwise accumulate one orphaned block
    // set per batch (ADVICE r06 #1).
    var np: DataFrame = null
    try {
      val newPairs =
        if (IcebergishTable.currentSnapshot(pairsTable) >= 0) {
          // Replay-protection anti-join reads ONLY the pairs-table buckets
          // this batch's pairs land in (both sides keyed on ia — the
          // StreamingKg cross-batch pattern): per-batch cost stays bounded
          // by the batch, not by the table's history. The candidate set is
          // ALSO materialized once (localCheckpoint) so the probe and the
          // write don't re-execute the join.
          val batchParts = pairs
            .select(IcebergishTable.partExpr("ia", pairsBuckets).as("p"))
            .distinct().collect().map(_.getInt(0)).toSeq
          val existing = IcebergishTable.read(spark, pairsTable)
            .where(col(IcebergishTable.PartCol).isin(batchParts: _*))
            .select(col("ia"), col("ib"))
          np = pairs.join(existing, Seq("ia", "ib"), "left_anti")
            .localCheckpoint()
          if (np.limit(1).count() > 0) Some((np, SaveMode.Append)) else None
        } else if (pairs.limit(1).count() > 0)
          Some((pairs, SaveMode.Overwrite))
        else None
      newPairs.foreach { case (np, mode) =>
        IcebergishTable.write(np, pairsTable, "ia", pairsBuckets, mode)
      }
      // Deliberately INSIDE the try: if the pairs write threw, committing
      // the signatures would make the replay emit nothing and lose the
      // batch's pairs forever — the state commit must only follow a
      // successful pairs append.
      commitState(fresh, stateTable, stateBuckets, hasState)
    } finally {
      // commitState unpersists fresh on success (idempotent); the failure
      // path, the batch-local pairs checkpoint, and the anti-joined np
      // checkpoint are freed here so a long-running stream's batches (and
      // failed attempts) can't accumulate blocks.
      if (np != null) np.unpersist(blocking = false)
      fresh.unpersist(blocking = false)
      pairs.unpersist(blocking = false)
    }
  }
}
