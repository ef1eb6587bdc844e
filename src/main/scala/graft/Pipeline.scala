package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.extract.HtmlText
import graft.io.IcebergishTable
import graft.link.Mentions
import graft.materialize.GraphOut
import graft.synth.PageSynth
import graft.triples.TripleExtract

/** End-to-end KG construction pipeline (SURVEY.md §7.2 #9, north_star):
  *
  *   pages (Iceberg-style table) ──scan (url, html) only──▶
  *   deterministic HTML→text extraction ──▶ mention scan (broadcast trie)
  *   ──▶ entity linking (broadcast hash join + tie-break window) ──▶
  *   relation candidates ──▶ triples ──▶ canonicalization (large-star/
  *   small-star CC over sameAs) ──▶ vertex/edge tables with per-partition
  *   checkpoint + lineage.
  *
  * Defaults mirror the reference's configuration envelope
  * (/root/reference/src/config.rs:112-114: parallelism 8, batch 100k):
  * `partitions` plays parallelism, `outputBuckets` the shard count.
  */
final case class PipelineConfig(
    seed: Long = 42L,
    nPages: Long = 1000L,
    partitions: Int = 32,
    outputBuckets: Int = 32,
    workDir: String = "/tmp/graft-pipeline",
    runId: String = "run-1",
    failAfterGroups: Int = -1,
    sentMin: Int = 3,
    sentSpread: Int = 5,
    // Max sameAs-edge count for which the component map is collected to the
    // driver and folded into the broadcast link winners; above it the build
    // canonicalizes via a join instead (driver-OOM guard for the day the
    // sameAs graph comes from DISCOVERED entities, not the dictionary).
    ccLocalThreshold: Long = 500000L,
    // Planted-hub synthesis share (north_rule skew case): fraction of fact
    // sentences whose subject is entity 0. 0 = historical corpus.
    hubShare: Double = 0.0,
    // Write-side skew salting: split each output bucket over this many
    // shuffle sub-keys (see GraphOut.bucketedDedupPlanAlignedSalted).
    // 1 = one file per bucket; raise when a hub subject concentrates a
    // bucket; 0 = AUTO — estimate the hottest subject's share from a small
    // page sample and size the salt so the hub bucket's slices weigh about
    // as much as an average bucket (see Pipeline.autoSalt).
    writeSalt: Int = 1
)

// InvalidConfig and the rest of the typed failure taxonomy live in
// model.scala (sealed GraftError hierarchy).

final case class PipelineStats(
    pages: Long,
    mentions: Long,
    triples: Long,
    vertices: Long,
    edges: Long
)

object Pipeline {

  /** Fail fast on inconsistent configuration (reference: verify_parameters
    * rejects fields+all-attributes conflicts at init, graph_loader.rs:253).
    */
  def validate(cfg: PipelineConfig): Unit = {
    def bad(m: String) = throw new InvalidConfig(m)
    if (cfg.nPages <= 0) bad(s"nPages must be positive: ${cfg.nPages}")
    if (cfg.partitions <= 0) bad(s"partitions must be positive: ${cfg.partitions}")
    if (cfg.outputBuckets <= 0) bad(s"outputBuckets must be positive: ${cfg.outputBuckets}")
    if (cfg.sentMin < 1 || cfg.sentSpread < 1)
      bad(s"sentence grammar needs sentMin>=1, sentSpread>=1: ${cfg.sentMin}/${cfg.sentSpread}")
    if (cfg.writeSalt < 0) bad(s"writeSalt must be >= 0 (0 = auto): ${cfg.writeSalt}")
    if (cfg.workDir.isEmpty || cfg.runId.isEmpty) bad("workDir and runId are required")
  }

  /** AUTO write-salt (cfg.writeSalt == 0): a planner hint, not an exact
    * statistic. Extract triples from a small page-prefix sample, take the
    * hottest subject's share s of sampled triples, and size the salt so the
    * hub's bucket splits into slices that each weigh about an average
    * bucket: the hub bucket holds ≈ s + (1-s)/n of all rows vs 1/n average,
    * so slices needed ≈ s·n (+1). Clamped to [1, 8] — salt costs up-to-salt
    * files per bucket and ~10% map-side hashing, so an unskewed corpus must
    * come out at 1 (it does: s ≈ 1/dictionary-size ⇒ s·n < 1). A prefix
    * sample under-detects hubs confined to late partitions; the clamp and
    * the downstream dedup's correctness-under-any-salt make that safe.
    */
  private[graft] def autoSalt(pages: Dataset[Page],
                              aliasDict: Seq[Alias],
                              phrases: Map[String, String],
                              canon: Map[String, String],
                              numParts: Int,
                              samplePages: Int = 1000,
                              canonDf: Option[DataFrame] = None): Int = {
    import org.apache.spark.sql.functions.{count => cnt}
    val raw = TripleExtract
      .extractDirect(pages.limit(samplePages), aliasDict, phrases, canon)
    // The bucket key downstream is the CANONICAL subject: when the sameAs
    // graph is too big for a driver map (canon arrives as a DataFrame), the
    // sample must canonicalize the same way, or a hub entity spread over k
    // aliases samples as k small subjects and the salt underestimates by k
    // — exactly in the large-corpus regime auto mode exists for.
    val sample = (canonDf match {
      case Some(df) =>
        TripleExtract.canonicalize(raw, df, assumeSmall = false, dedup = false)
      case None => raw
    })
      .groupBy(col("subj")).agg(cnt(lit(1)).as("n"))
      .agg(max(col("n")).as("hub"), sum(col("n")).as("total"))
      .head()
    if (sample.isNullAt(0) || sample.getLong(1) == 0L) 1
    else {
      val s = sample.getLong(0).toDouble / sample.getLong(1)
      math.max(1, math.min(8, math.ceil(s * numParts).toInt))
    }
  }

  /** Stage 0: synthesize the input table and materialize it Iceberg-style.
    * Idempotent: skipped when the table already exists with the same
    * snapshot contract (deterministic synthesis ⇒ same content).
    */
  def buildPagesTable(spark: SparkSession, cfg: PipelineConfig): String = {
    val table = s"${cfg.workDir}/pages"
    // Content fingerprint of the synthesis config: a reused workDir with a
    // CHANGED config must not silently serve stale pages (the synthesizer is
    // deterministic, so same fingerprint ⇒ same table content). Mismatch ⇒
    // rebuild. `partitions`/`outputBuckets` shape parallelism/layout only —
    // pages is a read-only input downstream, so layout is not part of the
    // content contract.
    val fingerprint =
      s"seed=${cfg.seed};nPages=${cfg.nPages};sentMin=${cfg.sentMin};" +
        s"sentSpread=${cfg.sentSpread}" +
        (if (cfg.hubShare > 0) s";hubShare=${cfg.hubShare}" else "")
    val fpFile = java.nio.file.Paths.get(table, "SYNTH_CONFIG")
    val current =
      if (java.nio.file.Files.exists(fpFile))
        Some(new String(java.nio.file.Files.readAllBytes(fpFile),
          java.nio.charset.StandardCharsets.UTF_8).trim)
      else None
    if (!IcebergishTable.exists(table) || !current.contains(fingerprint)) {
      // A shared (symlinked) pages table is someone else's data: never walk
      // through the link and delete it — unlink and rebuild locally.
      val tPath = java.nio.file.Paths.get(table)
      if (java.nio.file.Files.isSymbolicLink(tPath))
        java.nio.file.Files.delete(tPath)
      else if (IcebergishTable.exists(table)) IcebergishTable.drop(table)
      val pages = PageSynth.pages(spark, cfg.seed, cfg.nPages, cfg.partitions,
        cfg.sentMin, cfg.sentSpread, cfg.hubShare)
      IcebergishTable.write(pages.toDF, table, "url", cfg.outputBuckets)
      java.nio.file.Files.write(fpFile,
        fingerprint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    table
  }

  /** Read pages projecting only (url, html) — Catalyst pushes the pruning
    * into the parquet scan (the reference's projection pushdown, P1).
    */
  def readPagesForExtraction(spark: SparkSession, table: String): Dataset[Page] = {
    import spark.implicits._
    // html_extract is a native codegen'd Expression: scan → project →
    // extract fuse into one WholeStageCodegen span (no UDF, no ser/deser).
    IcebergishTable.read(spark, table)
      .select(col("url"), col("warc_ts"), col("html"),
        graft.functions.HtmlExtractExpr.html_extract(col("html")).as("text"),
        col("lang"))
      .as[Page]
  }

  /** Lean bench path: identical stages to [[run]] but no per-stage counts —
    * the only actions are the localCheckpoints and the checkpointed writes.
    * Returns the number of edge rows written (from the checkpoint layer's
    * lineage, i.e. free).
    */
  private def timed[T](name: String)(f: => T): T = {
    if (sys.env.contains("GRAFT_TIMING")) {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[timing] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    } else f
  }

  def build(spark: SparkSession, cfg: PipelineConfig): Long = {
    validate(cfg)
    val table = buildPagesTable(spark, cfg)
    val pages = readPagesForExtraction(spark, table)
    val aliasDict = PageSynth.aliasDictionary
    val phrases = PageSynth.relations.toMap

    // Canonicalization first. The strategy gate is SIZE: a sameAs graph at
    // dictionary scale collapses to a driver map folded into the broadcast
    // link winners (zero extra joins in the hot pass); a huge one (discovered
    // entities) never touches the driver — the raw triples canonicalize via
    // a join whose broadcast/shuffle choice is left to AQE.
    val (canonDf, fitsDriver) = timed("cc") {
      ConnectedComponents.componentsSized(
        PageSynth.sameAs(spark).toDF("src", "dst"),
        localThreshold = cfg.ccLocalThreshold)
    }

    // ONE fused narrow pass (codegen'd html_extract → char-trie scan →
    // map-side canonical linking → local candidate resolution), then ONE
    // shuffle: bucket-exchange with in-shuffle sort-dedup, one file per
    // bucket, lineage from the written columnar files.
    val ckpt = s"${cfg.workDir}/checkpoint"
    val edgesTable = s"${cfg.workDir}/edges"
    val inputTag = s"snap-${IcebergishTable.currentSnapshot(table)}"
    val canonMap: Map[String, String] =
      if (fitsDriver)
        canonDf.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      else Map.empty
    val rawTriples =
      if (fitsDriver)
        TripleExtract.extractDirect(pages, aliasDict, phrases, canonMap)
      else
        // No dedup here: the bucketed writer dedups in its own shuffle.
        TripleExtract.canonicalize(
          TripleExtract.extractDirect(pages, aliasDict, phrases),
          canonDf, assumeSmall = false, dedup = false)
    val salt =
      if (cfg.writeSalt == 0)
        timed("auto salt")(autoSalt(pages, aliasDict, phrases, canonMap,
          cfg.outputBuckets,
          canonDf = if (fitsDriver) None else Some(canonDf)))
      else cfg.writeSalt
    val edgeStats = timed("scan+dedup+write edges") {
      GraphOut.writeBucketedDedup(
        rawTriples.toDF, edgesTable, "subj", cfg.outputBuckets,
        Seq("subj", "pred", "obj", "url"), ckpt, cfg.runId, "edges",
        inputTag = inputTag, skewSalt = salt)
    }

    // Vertices derive from the written (compressed, pruned) edge table via
    // the fused single-exchange plan: endpoint-id union → ONE bucket
    // exchange → in-partition (part, id) degree aggregate → one file per
    // bucket (the old path exchanged twice: groupBy(id) + repartition).
    timed("write vertices") {
      val edges = IcebergishTable.read(spark, edgesTable)
      GraphOut.writeVerticesBucketed(
        edges, s"${cfg.workDir}/vertices", cfg.outputBuckets,
        ckpt, cfg.runId, "vertices", inputTag = inputTag)
    }
    // Cross-table atomic publish: pin (pages, edges, vertices) snapshots in
    // one root commit — a reader resolving through the root can never see
    // new edges with old vertices (the torn window between the two stage
    // commits above). See io.RootCommit.
    timed("root commit")(publishRoot(cfg, table))
    edgeStats.rowsWritten
  }

  /** The ONE cross-table root-publish used by both entry points — the
    * member-table set must never diverge between build() and run().
    */
  private def publishRoot(cfg: PipelineConfig, pagesTable: String): Unit =
    graft.io.RootCommit.commit(cfg.workDir, Map(
      "pages" -> IcebergishTable.currentSnapshot(pagesTable),
      "edges" -> IcebergishTable.currentSnapshot(s"${cfg.workDir}/edges"),
      "vertices" -> IcebergishTable.currentSnapshot(s"${cfg.workDir}/vertices")))

  /** Run the full pipeline; returns stage row counts. */
  def run(spark: SparkSession, cfg: PipelineConfig): PipelineStats = {
    import spark.implicits._
    validate(cfg)
    val table = buildPagesTable(spark, cfg)
    val pages = readPagesForExtraction(spark, table)

    val aliasDict = PageSynth.aliasDictionary
    val aliases = PageSynth.aliases(spark)
    val phrases = PageSynth.relations.toMap

    val scanned = Mentions.scanPages(pages, aliasDict, phrases).localCheckpoint()
    val mentions = scanned.flatMap(_.mentions)
    val cands = scanned.flatMap(_.cands)
    val linked = Mentions.link(mentions, aliases).localCheckpoint()
    val rawTriples = TripleExtract.triples(cands, linked)

    val sameAs = PageSynth.sameAs(spark).toDF("src", "dst")
    val canon = ConnectedComponents.components(sameAs)
    val triples = TripleExtract.canonicalize(rawTriples, canon)
      .localCheckpoint()

    val ckpt = s"${cfg.workDir}/checkpoint"
    val edgeStats = GraphOut.writeWithCheckpoint(
      triples.toDF, s"${cfg.workDir}/edges", "subj", cfg.outputBuckets,
      ckpt, cfg.runId, "edges", groupSize = 8,
      failAfterGroups = cfg.failAfterGroups)
    val verts = GraphOut.vertices(triples.toDF)
    GraphOut.writeWithCheckpoint(
      verts, s"${cfg.workDir}/vertices", "id", cfg.outputBuckets,
      ckpt, cfg.runId, "vertices", groupSize = 8)
    // Same atomic cross-table publish as build(): without it the
    // edges-then-vertices torn window stays open on this entry point and
    // RootCommit.readConsistent cannot serve run()-produced workDirs.
    publishRoot(cfg, table)

    PipelineStats(
      // Manifest-consistent count: a raw directory read would include
      // tombstoned/compacted files and committer orphans the snapshot view
      // correctly excludes.
      pages = IcebergishTable.read(spark, table).count(),
      mentions = linked.count(),
      triples = triples.count(),
      vertices = IcebergishTable.read(spark, s"${cfg.workDir}/vertices").count(),
      edges = IcebergishTable.read(spark, s"${cfg.workDir}/edges").count()
    )
  }
}
