package graft.synth

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.{Alias, Mention, Page, Triple}

/** Golden (synthesizer-known) linked mention: what the pipeline must find. */
final case class GoldenMention(
    url: String,
    mention: String,
    begin: Int,
    end: Int,
    entity: String,
    conf: Double
)

/** One synthesized page plus its ground truth. */
final case class SynthPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    goldenMentions: Seq[GoldenMention],
    goldenTriples: Seq[Triple]
)

/** Deterministic Common-Crawl-style page synthesizer (SURVEY.md §7.2 #2).
  *
  * Pure function of (seed, pageIndex) via the counter-based [[Rng]] — the
  * table is identical at any parallelism, which the byte-identity and P/R
  * tests rely on. Mirrors the reference's test philosophy of a fully-known
  * deterministic fixture (/root/reference/tests/graph_loader.rs:100-156).
  *
  * Each page embeds entity mentions from a closed alias vocabulary and
  * "fact" sentences `<aliasA> <relation phrase> <aliasB> .` that constitute
  * the golden triple set. The html wraps the ground-truth text in a fixed
  * tag grammar with deterministic noise (inline tags, entities, script/style
  * blocks, whitespace variants) that the extractor must strip back to the
  * exact text.
  */
object PageSynth {

  val NumEntities = 200
  /** Entities E0100..E0149 are duplicates of E0000..E0049 (sameAs pairs) —
    * exercised by canonicalization (connected components).
    */
  val DupRangeStart = 100
  val DupRangeLen = 50

  private val adjectives = Vector(
    "Zorval", "Quanta", "Nexor", "Veltro", "Ardent", "Bryce", "Cindra",
    "Dovex", "Ethra", "Fenric", "Galdor", "Hexion", "Ivara", "Jentra",
    "Kovast", "Lumera", "Mendar", "Norvic", "Ophire", "Pravik"
  )
  private val nouns = Vector(
    "Dynamics", "Systems", "Holdings", "Labs", "Industries", "Networks",
    "Logistics", "Robotics", "Energy", "Analytics", "Foundry", "Capital",
    "Materials", "Biotech", "Aerospace", "Mining", "Software", "Optics",
    "Telecom", "Marine"
  )
  private val fillers = Vector(
    "the", "report", "quarter", "market", "team", "announced", "growth",
    "today", "plan", "review", "update", "office", "region", "product",
    "launch", "result", "annual", "global", "board", "summary", "note",
    "staff", "week", "new", "strong", "early", "public", "record"
  )

  /** Relation phrase → predicate. Phrase words never occur in `fillers`. */
  val relations: Vector[(String, String)] = Vector(
    ("acquired", "acquired"),
    ("was founded by", "founded_by"),
    ("is located in", "located_in"),
    ("partnered with", "partner_of")
  )

  def entityId(i: Int): String = f"E$i%04d"

  /** Canonical entity for index i (closed form the CC stage must reproduce). */
  def canonicalOf(i: Int): Int =
    if (i >= DupRangeStart && i < DupRangeStart + DupRangeLen) i - DupRangeStart
    else i

  def entityName(i: Int): String =
    adjectives(i % adjectives.size) + " " + nouns((i / adjectives.size) % nouns.size)

  /** Full alias dictionary: exact name (1.0), "Corp" long form (0.9), and an
    * ambiguous bare-noun alias shared by every entity with that noun
    * (Zipf-ish hub aliases — the skew case for the link join).
    */
  def aliasDictionary: Seq[Alias] = {
    val full = (0 until NumEntities).map { i =>
      Alias(entityName(i), entityId(i), 1.0)
    }
    val long = (0 until NumEntities).map { i =>
      Alias(entityName(i) + " Corp", entityId(i), 0.9)
    }
    val ambiguous = (0 until NumEntities).map { i =>
      val noun = nouns((i / adjectives.size) % nouns.size)
      // Deterministic sub-1.0 prior so one entity wins each bare noun.
      val score = 0.4 + 0.4 * Rng.nextDouble(0xa11a5L, i.toLong, 0L)
      Alias(noun, entityId(i), math.rint(score * 1e6) / 1e6)
    }
    full ++ long ++ ambiguous
  }

  /** sameAs pairs feeding canonicalization. */
  def sameAsPairs: Seq[(String, String)] =
    (0 until DupRangeLen).map(i => (entityId(i), entityId(i + DupRangeStart)))

  /** Winner for an ambiguous alias: max score, tie → min entity id.
    * Must match the linker's window tie-break exactly.
    */
  private lazy val bestForAlias: Map[String, (String, Double)] =
    aliasDictionary
      .groupBy(_.alias)
      .map { case (a, as) =>
        val best = as.minBy(x => (-x.score, x.entity))
        a -> (best.entity, best.score)
      }

  // ---- page construction -------------------------------------------------

  private sealed trait Seg
  private final case class Plain(text: String) extends Seg
  private final case class Ment(alias: String, entity: String, conf: Double)
      extends Seg

  private val langs = Vector("en", "en", "en", "de", "fr", "es")

  /** `hubShare > 0` plants a pathological hub: that fraction of fact
    * sentences uses entity 0 as the subject (north_rule's "hub entity in
    * 50% of pages" skew case). Draws for the hub decision use a fresh index
    * and are only taken when hubShare > 0, so hubShare = 0 reproduces THIS
    * grammar version's corpus bit-for-bit (not round-1's — the round-2
    * grammar added coref/negative/n-ary sentence kinds, which reshuffled
    * all derived fixtures; every golden is recomputed, nothing is stored).
    */
  def page(seed: Long, i: Long, sentMin: Int = 3, sentSpread: Int = 5,
           hubShare: Double = 0.0): SynthPage = {
    val url = s"https://site${Rng.nextInt(seed, i, 1, 50)}.example/p/$i"
    val ts = new Timestamp(1600000000000L + (Rng.at(seed, i, 2) >>> 24))
    val lang = langs(Rng.nextInt(seed, i, 3, langs.size))

    val nSentences = sentMin + Rng.nextInt(seed, i, 4, sentSpread)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Vector[Seg]]

    // Title block.
    val titleEnt = Rng.nextZipf(seed, i, 5, NumEntities)
    blocks += Vector(
      Plain(s"Page $i about"),
      Ment(entityName(titleEnt), entityId(titleEnt), 1.0)
    )

    val triples = scala.collection.mutable.ArrayBuffer.empty[Triple]
    var s = 0
    while (s < nSentences) {
      val base = 100L + s * 50L
      val kind = Rng.nextDouble(seed, i, base)
      if (kind < 0.40) {
        // Fact sentence: aliasA phrase aliasB .
        val ea =
          if (hubShare > 0 && Rng.nextDouble(seed, i, base + 8) < hubShare) 0
          else Rng.nextZipf(seed, i, base + 1, NumEntities)
        var eb = Rng.nextInt(seed, i, base + 2, NumEntities)
        if (eb == ea) eb = (eb + 1) % NumEntities
        val (phrase, pred) = relations(Rng.nextInt(seed, i, base + 3, relations.size))
        val longA = Rng.nextDouble(seed, i, base + 4) < 0.3
        val longB = Rng.nextDouble(seed, i, base + 5) < 0.3
        val (aliasA, confA) =
          if (longA) (entityName(ea) + " Corp", 0.9) else (entityName(ea), 1.0)
        val (aliasB, confB) =
          if (longB) (entityName(eb) + " Corp", 0.9) else (entityName(eb), 1.0)
        blocks += Vector(
          Ment(aliasA, entityId(ea), confA),
          Plain(phrase),
          Ment(aliasB, entityId(eb), confB),
          Plain(".")
        )
        triples += Triple(
          entityId(canonicalOf(ea)), pred, entityId(canonicalOf(eb)),
          url, math.min(confA, confB)
        )
      } else if (kind < 0.52) {
        // Coreference sentence: `It <phrase> <aliasB> .` — "It" refers to
        // the page's TITLE entity (multi-sentence context, ROADMAP #1).
        val eb = Rng.nextInt(seed, i, base + 2, NumEntities)
        val (phrase, pred) = relations(Rng.nextInt(seed, i, base + 3, relations.size))
        val longB = Rng.nextDouble(seed, i, base + 5) < 0.3
        val (aliasB, confB) =
          if (longB) (entityName(eb) + " Corp", 0.9) else (entityName(eb), 1.0)
        blocks += Vector(
          Plain("It"),
          Plain(phrase),
          Ment(aliasB, entityId(eb), confB),
          Plain(".")
        )
        triples += Triple(
          entityId(canonicalOf(titleEnt)), pred, entityId(canonicalOf(eb)),
          url, confB // title mention links at conf 1.0
        )
      } else if (kind < 0.60) {
        // NEGATIVE pattern: `aliasA never <phrase> aliasB .` — the gap text
        // is NOT a relation phrase; a sloppy extractor that substring-matches
        // phrases (instead of exact-gap matching) would hallucinate a triple.
        val ea = Rng.nextZipf(seed, i, base + 1, NumEntities)
        var eb = Rng.nextInt(seed, i, base + 2, NumEntities)
        if (eb == ea) eb = (eb + 1) % NumEntities
        val (phrase, _) = relations(Rng.nextInt(seed, i, base + 3, relations.size))
        blocks += Vector(
          Ment(entityName(ea), entityId(ea), 1.0),
          Plain("never " + phrase),
          Ment(entityName(eb), entityId(eb), 1.0),
          Plain(".")
        )
        // no golden triple — precision stress
      } else if (kind < 0.67) {
        // N-ary conjunction: `A <phrase> B and C .` — the predicate
        // distributes over the conjuncts: (A,p,B) and (A,p,C).
        val ea = Rng.nextZipf(seed, i, base + 1, NumEntities)
        var eb = Rng.nextInt(seed, i, base + 2, NumEntities)
        if (eb == ea) eb = (eb + 1) % NumEntities
        var ec = Rng.nextInt(seed, i, base + 9, NumEntities)
        if (ec == ea) ec = (ec + 1) % NumEntities
        val (phrase, pred) = relations(Rng.nextInt(seed, i, base + 3, relations.size))
        blocks += Vector(
          Ment(entityName(ea), entityId(ea), 1.0),
          Plain(phrase),
          Ment(entityName(eb), entityId(eb), 1.0),
          Plain("and"),
          Ment(entityName(ec), entityId(ec), 1.0),
          Plain(".")
        )
        triples += Triple(entityId(canonicalOf(ea)), pred,
          entityId(canonicalOf(eb)), url, 1.0)
        triples += Triple(entityId(canonicalOf(ea)), pred,
          entityId(canonicalOf(ec)), url, 1.0)
      } else if (kind < 0.74) {
        // Cross-block anaphora: `The company <phrase> <aliasB> .` resolves
        // to the NEAREST PRECEDING entity mention — the title on early
        // sentences, otherwise the last mention of whatever block came
        // before (a fact object, a negative-pattern object, or even an
        // ambiguous bare-noun filler mention at conf < 1).
        val eb = Rng.nextInt(seed, i, base + 2, NumEntities)
        val (phrase, pred) = relations(Rng.nextInt(seed, i, base + 3, relations.size))
        val longB = Rng.nextDouble(seed, i, base + 5) < 0.3
        val (aliasB, confB) =
          if (longB) (entityName(eb) + " Corp", 0.9) else (entityName(eb), 1.0)
        val ante = blocks.reverseIterator.flatMap(_.reverseIterator)
          .collectFirst { case m: Ment => m }.get // title guarantees one
        blocks += Vector(
          Plain("The company"),
          Plain(phrase),
          Ment(aliasB, entityId(eb), confB),
          Plain(".")
        )
        triples += Triple(
          entityId(canonicalOf(ante.entity.substring(1).toInt)), pred,
          entityId(canonicalOf(eb)), url, math.min(ante.conf, confB))
      } else if (kind < 0.79) {
        // Nested clause: `A , which <p1> B , <p2> C .` — the parenthetical
        // yields (A, p1, B); the OUTER relation skips the clause and binds
        // the anchor, not the clause object: (A, p2, C). A sloppy extractor
        // pairing adjacent mentions would emit (B, p2, C) instead.
        val ea = Rng.nextZipf(seed, i, base + 1, NumEntities)
        var eb = Rng.nextInt(seed, i, base + 2, NumEntities)
        if (eb == ea) eb = (eb + 1) % NumEntities
        var ec = Rng.nextInt(seed, i, base + 9, NumEntities)
        if (ec == ea) ec = (ec + 1) % NumEntities
        val (p1, pred1) = relations(Rng.nextInt(seed, i, base + 3, relations.size))
        val (p2, pred2) = relations(Rng.nextInt(seed, i, base + 10, relations.size))
        blocks += Vector(
          Ment(entityName(ea), entityId(ea), 1.0),
          Plain(", which " + p1),
          Ment(entityName(eb), entityId(eb), 1.0),
          Plain(", " + p2),
          Ment(entityName(ec), entityId(ec), 1.0),
          Plain(".")
        )
        triples += Triple(entityId(canonicalOf(ea)), pred1,
          entityId(canonicalOf(eb)), url, 1.0)
        triples += Triple(entityId(canonicalOf(ea)), pred2,
          entityId(canonicalOf(ec)), url, 1.0)
      } else {
        // Filler sentence, optionally with one ambiguous bare-noun mention.
        val nWords = 5 + Rng.nextInt(seed, i, base + 1, 7)
        val words = (0 until nWords).map { w =>
          fillers(Rng.nextInt(seed, i, base + 20 + w, fillers.size))
        }
        val segs = scala.collection.mutable.ArrayBuffer.empty[Seg]
        segs += Plain(words.mkString(" "))
        if (Rng.nextDouble(seed, i, base + 6) < 0.3) {
          // Only nouns that actually occur in the dictionary (i < NumEntities
          // ⇒ noun index ranges over NumEntities / |adjectives| values).
          val usedNouns = math.min(nouns.size,
            (NumEntities + adjectives.size - 1) / adjectives.size)
          val noun = nouns(Rng.nextInt(seed, i, base + 7, usedNouns))
          val (ent, score) = bestForAlias(noun)
          segs += Ment(noun, ent, score)
        }
        segs += Plain(".")
        blocks += segs.toVector
      }
      s += 1
    }

    // ---- assemble text + offsets ----------------------------------------
    val textSb = new java.lang.StringBuilder(512)
    val mentions = scala.collection.mutable.ArrayBuffer.empty[GoldenMention]
    var blockIdx = 0
    while (blockIdx < blocks.length) {
      if (blockIdx > 0) textSb.append('\n')
      val segs = blocks(blockIdx)
      var segIdx = 0
      while (segIdx < segs.length) {
        if (segIdx > 0) textSb.append(' ')
        segs(segIdx) match {
          case Plain(t) => textSb.append(t)
          case Ment(alias, ent, conf) =>
            val b = textSb.length
            textSb.append(alias)
            mentions += GoldenMention(url, alias, b, textSb.length, ent, conf)
        }
        segIdx += 1
      }
      blockIdx += 1
    }
    val text = textSb.toString

    // ---- assemble html with deterministic noise --------------------------
    val html = renderHtml(seed, i, blocks.toVector)

    SynthPage(url, ts, html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text, lang, mentions.toVector, triples.toVector)
  }

  private def renderHtml(seed: Long, i: Long, blocks: Vector[Vector[Seg]]): String = {
    val sb = new java.lang.StringBuilder(2048)
    sb.append("<html><head>")
    var b = 0
    while (b < blocks.length) {
      val tag =
        if (b == 0) "title"
        else Vector("p", "p", "div", "h2")(Rng.nextInt(seed, i, 10000L + b, 4))
      val attrs = Rng.nextInt(seed, i, 20000L + b, 3) match {
        case 0 => ""
        case 1 => " class=\"c" + Rng.nextInt(seed, i, 30000L + b, 9) + "\""
        case _ => " id=\"b" + b + "\""
      }
      sb.append('<').append(tag).append(attrs).append('>')
      if (Rng.nextDouble(seed, i, 40000L + b) < 0.4) sb.append("\n  ")
      // Render segments word-by-word with noise.
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      blocks(b).foreach {
        case Plain(t)        => words ++= t.split(' ')
        case Ment(a, _, _)   => words ++= a.split(' ')
      }
      var w = 0
      while (w < words.length) {
        if (w > 0) {
          // separator: plain space / nbsp / newline+indent — all collapse.
          Rng.nextInt(seed, i, 100000L + b * 128L + w, 10) match {
            case 0 => sb.append("&nbsp;")
            case 1 => sb.append("\n   ")
            case 2 => sb.append("  ")
            case _ => sb.append(' ')
          }
        }
        val word = words(w)
        Rng.nextInt(seed, i, 200000L + b * 128L + w, 20) match {
          case 0 => sb.append("<b>").append(word).append("</b>")
          case 1 => sb.append("<i>").append(word).append("</i>")
          case 2 => sb.append("<a href=\"#l").append(w).append("\">")
                      .append(word).append("</a>")
          case 3 if word.nonEmpty && word.charAt(0).isLetter =>
            // First char as a numeric entity — decodes back to the word.
            sb.append("&#").append(word.charAt(0).toInt).append(';')
              .append(word.substring(1))
          case _ => sb.append(word)
        }
        w += 1
      }
      if (Rng.nextDouble(seed, i, 50000L + b) < 0.3) sb.append(" \n")
      sb.append("</").append(tag).append('>')
      if (b == 0) {
        // head → body transition plus optional script/style noise.
        if (Rng.nextDouble(seed, i, 40L) < 0.5)
          sb.append("<script>var x = 1; if (x < 2) { x = 3; }</script>")
        sb.append("</head><body>")
      } else if (Rng.nextDouble(seed, i, 60000L + b) < 0.15) {
        sb.append("<style>p { color: #333; }</style>")
      }
      b += 1
    }
    sb.append("</body></html>")
    sb.toString
  }

  // ---- Spark-side generation ---------------------------------------------

  /** Distributed deterministic synthesis: identical content at any
    * parallelism because each row is a pure function of (seed, id).
    */
  def synthesize(spark: SparkSession, seed: Long, n: Long,
                 partitions: Int = 32, sentMin: Int = 3,
                 sentSpread: Int = 5, hubShare: Double = 0.0): Dataset[SynthPage] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions)
      .map(i => page(seed, i, sentMin, sentSpread, hubShare))
  }

  def pages(spark: SparkSession, seed: Long, n: Long,
            partitions: Int = 32, sentMin: Int = 3,
            sentSpread: Int = 5, hubShare: Double = 0.0): Dataset[Page] = {
    import spark.implicits._
    synthesize(spark, seed, n, partitions, sentMin, sentSpread, hubShare)
      .map(p => Page(p.url, p.warc_ts, p.html, p.text, p.lang))
  }

  def goldenMentions(spark: SparkSession, seed: Long, n: Long,
                     partitions: Int = 32, sentMin: Int = 3,
                     sentSpread: Int = 5, hubShare: Double = 0.0): Dataset[GoldenMention] = {
    import spark.implicits._
    synthesize(spark, seed, n, partitions, sentMin, sentSpread, hubShare)
      .flatMap(_.goldenMentions)
  }

  def goldenTriples(spark: SparkSession, seed: Long, n: Long,
                    partitions: Int = 32, sentMin: Int = 3,
                    sentSpread: Int = 5, hubShare: Double = 0.0): Dataset[Triple] = {
    import spark.implicits._
    synthesize(spark, seed, n, partitions, sentMin, sentSpread, hubShare)
      .flatMap(_.goldenTriples)
  }

  def aliases(spark: SparkSession): Dataset[Alias] = {
    import spark.implicits._
    spark.createDataset(aliasDictionary)
  }

  def sameAs(spark: SparkSession): Dataset[(String, String)] = {
    import spark.implicits._
    spark.createDataset(sameAsPairs)
  }
}
