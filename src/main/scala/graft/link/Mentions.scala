package graft.link

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Alias, LinkedMention, Mention, Page}

/** Mention detection + entity linking (SURVEY.md §7.2 #5).
  *
  * Scan: tokenize extracted text (alphanumeric runs with char offsets),
  * longest-match against the broadcast [[AliasTrie]] — a narrow `flatMap`,
  * no shuffle. Matches never span a block ('\n') or any non-single-space
  * gap, mirroring sentence boundaries.
  *
  * Link: broadcast hash join of mentions against the alias dictionary
  * (small dim side — the reference's metadata-catalog analog,
  * /root/reference/src/graph_loader.rs:1047-1109), then a deterministic
  * tie-break window `row_number over (partition by url, begin
  * order by score desc, entity asc)` picking the winning entity.
  */
object Mentions {

  /** Pure scan of one document's text — char-level, zero allocation in the
    * hot loop until a mention is found (also used by tests directly).
    */
  def scanText(url: String, text: String, trie: AliasTrie): Seq[Mention] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    val n = text.length
    var i = 0
    while (i < n) {
      // advance to the next token start
      while (i < n && !text.charAt(i).isLetterOrDigit) i += 1
      if (i < n) {
        val e = trie.matchEnd(text, i)
        if (e > i) {
          out += Mention(url, text.substring(i, e), i, e)
          i = e // non-overlapping, longest match consumes its span
        } else {
          // skip this token
          while (i < n && text.charAt(i).isLetterOrDigit) i += 1
        }
      }
    }
    out.toSeq
  }

  /** Fused single-pass scan output: one row per page carrying both the
    * mention spans and the relation candidates, so the (expensive) HTML
    * extraction + trie walk happens exactly once per page — the analog of
    * the reference decoding each batch once and fanning results out
    * (/root/reference/src/graph_loader.rs:420-472).
    */
  final case class PageScan(url: String,
                            mentions: Seq[Mention],
                            cands: Seq[graft.triples.RelCandidate])

  /** Single narrow pass over pages: mentions + relation candidates. */
  def scanPages(pages: Dataset[Page], aliases: Seq[Alias],
                phrases: Map[String, String]): Dataset[PageScan] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val trieB = spark.sparkContext.broadcast(
      AliasTrie.build(aliases.map(_.alias).distinct))
    val phrasesB = spark.sparkContext.broadcast(phrases)
    // Narrow the typed input to the two fields the closure reads — a map
    // over Dataset[Page] would deserialize the html payload per row.
    pages.select($"url", $"text").as[(String, String)].map { case (url, text) =>
      val ms = scanText(url, text, trieB.value)
      val cs = graft.triples.TripleExtract
        .allCandidates(url, text, ms, phrasesB.value)
      PageScan(url, ms, cs)
    }
  }

  /** Distributed mention scan: narrow map-side flatMap over pages. */
  def scan(pages: Dataset[Page], aliases: Seq[Alias]): Dataset[Mention] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val trieB = spark.sparkContext.broadcast(
      AliasTrie.build(aliases.map(_.alias).distinct))
    pages.select($"url", $"text").as[(String, String)]
      .flatMap { case (url, text) => scanText(url, text, trieB.value) }
  }

  /** Pre-reduced link winners: the tie-break (score desc, entity asc) is
    * context-free, so the winner per alias can be computed once driver-side
    * and broadcast — turning the link step into a map-side lookup with no
    * shuffle at all. [[link]] below is the general operator (broadcast hash
    * join + window) for when scoring needs row context; the pipeline's hot
    * path uses this.
    */
  def aliasWinners(aliases: Seq[Alias]): Map[String, (String, Double)] =
    aliases.groupBy(_.alias).map { case (a, as) =>
      val best = as.minBy(x => (-x.score, x.entity))
      a -> (best.entity, best.score)
    }

  /** Local (per-row) linking against pre-reduced winners. */
  def linkLocal(ms: Seq[Mention],
                winners: Map[String, (String, Double)]): Seq[LinkedMention] =
    ms.flatMap { m =>
      winners.get(m.mention).map { case (entity, score) =>
        LinkedMention(m.url, m.mention, m.begin, m.end, entity, score)
      }
    }

  /** Entity linking: broadcast hash join + window tie-break. */
  def link(mentions: Dataset[Mention],
           aliases: Dataset[Alias]): Dataset[LinkedMention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val w = Window
      .partitionBy($"url", $"begin")
      .orderBy($"score".desc, $"entity".asc)
    mentions
      .join(broadcast(aliases.toDF), $"mention" === $"alias", "inner")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"url", $"mention", $"begin", $"end", $"entity",
        $"score".as("conf"))
      .as[LinkedMention]
  }
}
