package graft

import graft.link.{AliasTrie, Mentions}
import graft.triples.TripleExtract

/** Title-coreference and negative-pattern extraction (ROADMAP #1):
  * `It <phrase> <B>` resolves to the title entity; `A never <phrase> B`
  * must NOT produce a triple (gap matching is exact, not substring).
  */
class CorefExtractSpec extends SparkSpec {

  private val phrases = Map(
    "acquired" -> "acquired",
    "was founded by" -> "founded_by")
  private val trie = AliasTrie.build(Seq("Acme Labs", "Beta Corp", "Gamma Inc"))

  test("`It <phrase> <B>` in a later block resolves to the title entity") {
    val text = "Page 1 about Acme Labs\n" +
      "the quarterly report was strong .\n" +
      "It acquired Beta Corp .\n" +
      "It was founded by Gamma Inc ."
    val ms = Mentions.scanText("u", text, trie)
    val cands = TripleExtract.allCandidates("u", text, ms, phrases)
    val coref = cands.filter(_.beginA == ms.head.begin)
    assert(coref.map(_.pred).toSet == Set("acquired", "founded_by"))
    // beginB anchors at the object mention of each coref sentence.
    val byPred = coref.map(c => c.pred -> c.beginB).toMap
    assert(text.substring(byPred("acquired")).startsWith("Beta Corp"))
    assert(text.substring(byPred("founded_by")).startsWith("Gamma Inc"))
  }

  test("negative patterns and non-phrase gaps produce no candidates") {
    val text = "Page 2 about Acme Labs\n" +
      "Beta Corp never acquired Gamma Inc .\n" +
      "It never acquired Beta Corp .\n" +
      "It reviewed Beta Corp ."
    val ms = Mentions.scanText("u", text, trie)
    val cands = TripleExtract.allCandidates("u", text, ms, phrases)
    assert(cands.isEmpty, s"hallucinated candidates: $cands")
  }

  test("n-ary conjunction distributes the predicate over every conjunct") {
    val text = "Page 3 about Acme Labs\n" +
      "Acme Labs acquired Beta Corp and Gamma Inc .\n" +
      "Beta Corp and Gamma Inc ." // bare conjunction, no phrase → nothing
    val ms = Mentions.scanText("u", text, trie)
    val cands = TripleExtract.allCandidates("u", text, ms, phrases)
    val acquired = cands.filter(_.pred == "acquired")
    assert(acquired.length == 2, s"got $acquired")
    val subjStarts = acquired.map(c => text.substring(c.beginA).takeWhile(_ != ' ')).toSet
    assert(subjStarts == Set("Acme")) // both triples share the subject
    val objs = acquired.map(c =>
      text.substring(c.beginB, c.beginB + 9)).toSet
    assert(objs == Set("Beta Corp", "Gamma Inc"))
    // The bare `B and C` sentence yields no candidates at all.
    assert(cands.length == 2)
  }

  test("`The company <phrase> <B>` resolves to the NEAREST preceding mention") {
    val text = "Page 4 about Acme Labs\n" +
      "Gamma Inc acquired Beta Corp .\n" +
      "The company was founded by Acme Labs .\n" + // → Beta Corp (nearest)
      "the market report was strong .\n" +
      "The company acquired Gamma Inc ." // still → Acme Labs of block 3
    val ms = Mentions.scanText("u", text, trie)
    val cands = TripleExtract.allCandidates("u", text, ms, phrases)
    val anaphora = cands.filter(c =>
      text.startsWith("The company", prevNewline(text, c.beginB)))
    assert(anaphora.length == 2, s"got $cands")
    val founded = anaphora.find(_.pred == "founded_by").get
    // Antecedent of sentence 3 is Beta Corp — the nearest PRECEDING mention,
    // not the title and not the subject of its sentence.
    assert(text.substring(founded.beginA).startsWith("Beta Corp"))
    assert(text.substring(founded.beginB).startsWith("Acme Labs"))
    val acq = anaphora.find(_.pred == "acquired").get
    // Sentence 5's antecedent skips the mention-free filler block and lands
    // on sentence 3's object.
    assert(text.substring(acq.beginA).startsWith("Acme Labs"))
    assert(text.substring(acq.beginB).startsWith("Gamma Inc"))
    // And `never <phrase>` gaps stay silent for the pronoun form too.
    val neg = "Page 5 about Acme Labs\nThe company never acquired Beta Corp ."
    val negCands = TripleExtract.allCandidates("u", neg,
      Mentions.scanText("u", neg, trie), phrases)
    assert(negCands.isEmpty, s"hallucinated: $negCands")
  }

  /** Start offset of the '\n'-delimited block containing `pos`. */
  private def prevNewline(text: String, pos: Int): Int = {
    val nl = text.lastIndexOf('\n', pos)
    if (nl < 0) 0 else nl + 1
  }

  test("nested clause binds the outer relation to the anchor, not the clause object") {
    val text = "Page 6 about Acme Labs\n" +
      "Acme Labs , which acquired Beta Corp , was founded by Gamma Inc ."
    val ms = Mentions.scanText("u", text, trie)
    val cands = TripleExtract.allCandidates("u", text, ms, phrases)
    assert(cands.length == 2, s"got $cands")
    val clause = cands.find(_.pred == "acquired").get
    assert(text.substring(clause.beginA).startsWith("Acme Labs"))
    assert(text.substring(clause.beginB).startsWith("Beta Corp"))
    val outer = cands.find(_.pred == "founded_by").get
    // The naive adjacent-pair reading would be (Beta Corp, founded_by, …).
    assert(text.substring(outer.beginA).startsWith("Acme Labs"),
      s"outer subject is the clause object, not the anchor: $outer")
    assert(text.substring(outer.beginB).startsWith("Gamma Inc"))

    // A bare `, <phrase>` with NO open clause stays silent; so does
    // `, which <non-phrase>` followed by `, <phrase>` (anchor was reset).
    val bare = "Page 7 about Acme Labs\n" +
      "Beta Corp , acquired Gamma Inc .\n" +
      "Acme Labs , which reviewed Beta Corp , acquired Gamma Inc ."
    val bareCands = TripleExtract.allCandidates("u", bare,
      Mentions.scanText("u", bare, trie), phrases)
    assert(bareCands.isEmpty, s"hallucinated: $bareCands")
  }

  test("synthesized anaphora sentences round-trip exactly through the fused extractor") {
    import spark.implicits._
    val pages = graft.synth.PageSynth.pages(spark, 77L, 300L, 4)
    val got = TripleExtract.extractDirect(pages,
        graft.synth.PageSynth.aliasDictionary,
        graft.synth.PageSynth.relations.toMap,
        graft.synth.PageSynth.sameAsPairs.map { case (c, d) => d -> c }.toMap)
      .collect().map(t => (t.subj, t.pred, t.obj, t.url, t.conf)).toSet
    val want = graft.synth.PageSynth.goldenTriples(spark, 77L, 300L, 4)
      .collect().map(t => (t.subj, t.pred, t.obj, t.url, t.conf)).toSet
    assert(got == want, // exact P/R == 1.0, anaphora sentences included
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  test("coref ignores pages whose first mention is not in the title block") {
    val text = "no mentions here\nIt acquired Beta Corp ."
    val ms = Mentions.scanText("u", text, trie)
    val cands = TripleExtract.corefCandidates("u", text, ms, phrases)
    assert(cands.isEmpty) // 'It' cannot refer to a later mention
  }
}
