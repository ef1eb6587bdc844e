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

  private[link] final case class Token(text: String, begin: Int, end: Int)

  /** Tokenize: maximal runs of ASCII letters/digits, with offsets. */
  private[link] def tokenize(text: String): IndexedSeq[Token] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c.isLetterOrDigit) {
        val b = i
        while (i < n && text.charAt(i).isLetterOrDigit) i += 1
        out += Token(text.substring(b, i), b, i)
      } else i += 1
    }
    out.toIndexedSeq
  }

  /** Pure scan of one document's text — also used by tests directly. */
  def scanText(url: String, text: String, trie: AliasTrie): Seq[Mention] = {
    val tokens = tokenize(text)
    // A match may extend from token k-1 to token k only when the gap
    // between them is exactly one plain space (multi-token aliases are
    // single-spaced; '\n'/'.' gaps are block and sentence boundaries).
    def gapIsSingleSpace(idx: Int): Boolean =
      idx + 1 < tokens.length &&
        tokens(idx + 1).begin == tokens(idx).end + 1 &&
        text.charAt(tokens(idx).end) == ' '
    val texts = tokens.map(_.text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    var t = 0
    while (t < tokens.length) {
      val len = trie.longestMatch(
        texts, t,
        k => gapIsSingleSpace(t + k - 1))
      if (len > 0) {
        val b = tokens(t).begin
        val e = tokens(t + len - 1).end
        out += Mention(url, text.substring(b, e), b, e)
        t += len // non-overlapping, longest match consumes its tokens
      } else t += 1
    }
    out.toSeq
  }

  /** Distributed mention scan: narrow map-side flatMap over pages. */
  def scan(pages: Dataset[Page], aliases: Seq[Alias]): Dataset[Mention] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val trieB = spark.sparkContext.broadcast(
      AliasTrie.build(aliases.map(_.alias).distinct))
    pages.flatMap(p => scanText(p.url, p.text, trieB.value))
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
