package graft

import java.nio.file.Files

import graft.io.IcebergishTable
import graft.materialize.{Checkpoint, GraphOut, SimulatedFailure}
import graft.synth.PageSynth
import graft.triples.TripleExtract
import graft.link.Mentions
import graft.canon.ConnectedComponents

/** End-to-end pipeline: golden-triple P/R, canonicalization, and
  * checkpointed resume (FIXTURES.md §4, §6).
  */
class PipelineSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("e2e: emitted triples reach P/R >= 0.95 vs golden set (exact match expected)") {
    import spark.implicits._
    val cfg = PipelineConfig(seed = 42L, nPages = 600L, partitions = 8,
      outputBuckets = 16, workDir = tmpDir("graft-e2e"), runId = "r1")
    val stats = Pipeline.run(spark, cfg)
    assert(stats.pages == 600L)
    assert(stats.triples > 0)

    val got = IcebergishTable.read(spark, s"${cfg.workDir}/edges")
      .select("subj", "pred", "obj")
      .as[(String, String, String)].collect().toSet
    val goldenCanon = PageSynth.goldenTriples(spark, 42L, 600L, 8)
      .map(t => (t.subj, t.pred, t.obj)).collect().toSet
    // run() publishes the same atomic cross-table root as build():
    // consistent readers must be servable from either entry point.
    assert(graft.io.RootCommit.currentRoot(cfg.workDir) >= 0)
    assert(graft.io.RootCommit.readConsistent(spark, cfg.workDir, "edges")
      .count() == stats.edges)

    val tp = (got intersect goldenCanon).size.toDouble
    val precision = tp / got.size
    val recall = tp / goldenCanon.size
    assert(precision >= 0.95, s"precision $precision")
    assert(recall >= 0.95, s"recall $recall")
    // By construction the pipeline should be exact, not merely >= 0.95.
    assert(got == goldenCanon)

    // Canonicalization really happened: no duplicate-range ids remain.
    val dupIds = got.flatMap(t => Seq(t._1, t._3))
      .filter(id => id >= "E0100" && id < "E0150")
    assert(dupIds.isEmpty, s"uncanonicalized ids: $dupIds")
  }

  test("resume: crash mid-write recomputes only pending partitions; final table identical") {
    import spark.implicits._
    val n = 300L
    val pages = PageSynth.pages(spark, 7L, n, 8)
      .map(p => Page(p.url, p.warc_ts, p.html,
        graft.extract.HtmlText.extract(p.html), p.lang))
    val aliasDict = PageSynth.aliasDictionary
    val linked = Mentions.link(
      Mentions.scan(pages, aliasDict), PageSynth.aliases(spark))
    val cands = TripleExtract.candidates(
      pages, aliasDict.map(_.alias).distinct, PageSynth.relations.toMap)
    val triples = TripleExtract.canonicalize(
      TripleExtract.triples(cands, linked),
      ConnectedComponents.components(
        PageSynth.sameAs(spark).toDF("src", "dst"))).toDF.localCheckpoint()

    val numParts = 16
    // Clean full write → expected table.
    val refDir = tmpDir("graft-ref")
    GraphOut.writeWithCheckpoint(triples, s"$refDir/edges", "subj", numParts,
      s"$refDir/ckpt", "ref", "edges", groupSize = 4)
    val expected = IcebergishTable.read(spark, s"$refDir/edges")
      .select("subj", "pred", "obj", "url").collect()
      .map(_.toSeq).toSet

    // Crashing write: fails after 2 of 4 groups.
    val dir = tmpDir("graft-resume")
    intercept[SimulatedFailure] {
      GraphOut.writeWithCheckpoint(triples, s"$dir/edges", "subj", numParts,
        s"$dir/ckpt", "r1", "edges", groupSize = 4, failAfterGroups = 2)
    }
    val doneBefore = Checkpoint.doneParts(spark, s"$dir/ckpt", "r1", "edges", "static")
    assert(doneBefore.size == 8, s"expected 8 acked parts, got $doneBefore")

    // Resume: only the remaining 8 partitions are recomputed.
    val stats = GraphOut.writeWithCheckpoint(triples, s"$dir/edges", "subj",
      numParts, s"$dir/ckpt", "r1", "edges", groupSize = 4)
    assert(stats.partsWritten.toSet == (0 until numParts).toSet -- doneBefore)
    assert(stats.partsSkipped.toSet == doneBefore)

    val got = IcebergishTable.read(spark, s"$dir/edges")
      .select("subj", "pred", "obj", "url").collect()
      .map(_.toSeq).toSet
    assert(got == expected)

    // Lineage recorded: every partition has fingerprint + counts.
    val ckpt = Checkpoint.read(spark, s"$dir/ckpt").collect()
    assert(ckpt.map(_.part).toSet == (0 until numParts).toSet)
    assert(ckpt.forall(r => r.status == "done" && r.wall_ms >= 0))
  }

  test("checkpoint acks are bound to the input snapshot: stale tag forces recompute") {
    import spark.implicits._
    val triples = Seq(
      Triple("E1", "p", "E2", "u1", 1.0),
      Triple("E3", "p", "E4", "u2", 1.0)).toDF
    val dir = tmpDir("graft-stale")
    GraphOut.writeBucketedDedup(triples, s"$dir/edges", "subj", 4,
      Seq("subj", "pred", "obj", "url"), s"$dir/ckpt", "r1", "edges",
      inputTag = "snap-0")
    // Same tag → full skip.
    val again = GraphOut.writeBucketedDedup(triples, s"$dir/edges", "subj", 4,
      Seq("subj", "pred", "obj", "url"), s"$dir/ckpt", "r1", "edges",
      inputTag = "snap-0")
    assert(again.partsWritten.isEmpty && again.partsSkipped.size == 4)
    // New input snapshot → acks are stale, everything recomputes.
    val fresh = GraphOut.writeBucketedDedup(triples, s"$dir/edges", "subj", 4,
      Seq("subj", "pred", "obj", "url"), s"$dir/ckpt", "r1", "edges",
      inputTag = "snap-1")
    assert(fresh.partsWritten.size == 4)
  }

  test("fused build() path emits exactly the same edge table as run()") {
    import spark.implicits._
    def edges(workDir: String): Set[(String, String, String, String)] =
      IcebergishTable.read(spark, s"$workDir/edges")
        .select("subj", "pred", "obj", "url")
        .as[(String, String, String, String)].collect().toSet
    val d1 = tmpDir("graft-run")
    Pipeline.run(spark, PipelineConfig(seed = 5L, nPages = 250L,
      partitions = 4, outputBuckets = 8, workDir = d1, runId = "a"))
    val d2 = tmpDir("graft-build")
    Pipeline.build(spark, PipelineConfig(seed = 5L, nPages = 250L,
      partitions = 4, outputBuckets = 8, workDir = d2, runId = "b"))
    assert(edges(d1) == edges(d2))
  }

  test("pipeline is deterministic across runs and parallelism") {
    import spark.implicits._
    def runOnce(parts: Int): Set[(String, String, String, String)] = {
      val cfg = PipelineConfig(seed = 11L, nPages = 150L, partitions = parts,
        outputBuckets = 8, workDir = tmpDir("graft-det"), runId = "d")
      Pipeline.run(spark, cfg)
      IcebergishTable.read(spark, s"${cfg.workDir}/edges")
        .select("subj", "pred", "obj", "url")
        .as[(String, String, String, String)].collect().toSet
    }
    assert(runOnce(2) == runOnce(8))
  }
}
