package graft.extract

import scala.collection.mutable

/** Deterministic DOM-order HTML → text extraction (SURVEY.md §7.2 #4).
  *
  * Pure function of the html bytes only: UTF-8 decode, single forward scan,
  * no locale-sensitive ops, no regex. The per-row invariant required by
  * BASELINE.json `input_hint` is `extract(page.html) == page.text`
  * byte-identical per url, at every parallelism level.
  *
  * Extraction spec (the synthesizer in graft.synth.PageSynth emits html/text
  * pairs obeying the same spec, from independent code paths):
  *   1. `<script>`/`<style>` element content is dropped entirely.
  *   2. Block-level tags (title, p, div, h1..h6, li, br, tr, ul, ol, table)
  *      are block boundaries; all other tags are inline and removed.
  *   3. Character entities `&amp; &lt; &gt; &quot; &apos; &#NN;` decode to
  *      their characters; `&nbsp;` decodes to a plain space.
  *   4. Within a block, runs of whitespace collapse to one space; blocks are
  *      trimmed; empty blocks are dropped; blocks join with a single '\n'.
  *
  * The reference's only computed scalar is `collection_name_from_id`
  * (/root/reference/src/graph_loader.rs:51-56); this extractor plays the
  * analogous "derive a clean column during the scan" role at KG scale.
  */
object HtmlText {

  private val blockTags: Set[String] = Set(
    "title", "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "br", "tr", "td", "ul", "ol", "table"
  )

  private val skipTags: Set[String] = Set("script", "style")

  private final val TagInline = 0
  private final val TagBlock = 1
  private final val TagSkipScript = 2
  private final val TagSkipStyle = 3

  /** Zero-allocation tag classification over `s[start, end)` — exactly
    * `substring.toLowerCase` matched against [[blockTags]] / [[skipTags]]
    * (the sets remain the readable spec; specs assert equivalence), minus
    * the per-tag substring + lowercase + hash lookups that dominated the
    * extractor's allocation rate on the 400k-page bench scan.
    */
  private def classifyTag(s: String, start: Int, end: Int): Int = {
    @inline def lc(i: Int): Char = {
      val c = s.charAt(start + i)
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    }
    (end - start) match {
      case 1 => if (lc(0) == 'p') TagBlock else TagInline
      case 2 =>
        val a = lc(0); val b = lc(1)
        val block = (a: @annotation.switch) match {
          case 'h' => b >= '1' && b <= '6'
          case 'l' => b == 'i'
          case 'b' => b == 'r'
          case 't' => b == 'r' || b == 'd'
          case 'u' => b == 'l'
          case 'o' => b == 'l'
          case _ => false
        }
        if (block) TagBlock else TagInline
      case 3 =>
        if (lc(0) == 'd' && lc(1) == 'i' && lc(2) == 'v') TagBlock
        else TagInline
      case 5 =>
        if (lc(0) == 't' && lc(1) == 'i' && lc(2) == 't' && lc(3) == 'l' &&
          lc(4) == 'e') TagBlock
        else if (lc(0) == 't' && lc(1) == 'a' && lc(2) == 'b' &&
          lc(3) == 'l' && lc(4) == 'e') TagBlock
        else if (lc(0) == 's' && lc(1) == 't' && lc(2) == 'y' &&
          lc(3) == 'l' && lc(4) == 'e') TagSkipStyle
        else TagInline
      case 6 =>
        if (lc(0) == 's' && lc(1) == 'c' && lc(2) == 'r' && lc(3) == 'i' &&
          lc(4) == 'p' && lc(5) == 't') TagSkipScript
        else TagInline
      case _ => TagInline
    }
  }

  /** Extract plain text from UTF-8 html bytes. Total: never throws on
    * malformed input (unterminated tags/entities pass through as text-ish
    * garbage deterministically).
    */
  def extract(html: Array[Byte]): String = {
    if (html == null || html.isEmpty) return ""
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val blocks = mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder(256)
    var pendingSpace = false

    def appendChar(c: Char): Unit = {
      if (c == ' ' || c == '\n' || c == '\t' || c == '\r') {
        pendingSpace = true
      } else {
        if (pendingSpace && cur.length > 0) cur.append(' ')
        pendingSpace = false
        cur.append(c)
      }
    }

    def flushBlock(): Unit = {
      if (cur.length > 0) { blocks += cur.toString; cur.setLength(0) }
      pendingSpace = false
    }

    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        // Parse tag name (ASCII letters/digits after optional '/').
        var j = i + 1
        var closing = false
        if (j < n && s.charAt(j) == '/') { closing = true; j += 1 }
        val nameStart = j
        while (j < n && (s.charAt(j).isLetterOrDigit)) j += 1
        val kind = classifyTag(s, nameStart, j)
        // Advance to the closing '>' of this tag.
        var k = j
        while (k < n && s.charAt(k) != '>') k += 1
        if (!closing && (kind == TagSkipScript || kind == TagSkipStyle)) {
          // Drop content up to the matching close tag (no nesting of
          // script/style inside themselves in well-formed input). The
          // close-tag search stays the lowercase literal the old
          // `"</" + name` built — same unterminated-on-mixed-case behavior.
          val close = if (kind == TagSkipScript) "</script" else "</style"
          val idx = s.indexOf(close, k)
          if (idx < 0) { i = n } // unterminated: drop the rest
          else {
            var m = idx + close.length
            while (m < n && s.charAt(m) != '>') m += 1
            i = m + 1
          }
        } else {
          if (kind == TagBlock) flushBlock()
          i = if (k < n) k + 1 else n
        }
      } else if (c == '&') {
        // Entity decode; on no match, '&' passes through literally.
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          val ent = s.substring(i + 1, semi)
          val decoded: Int = ent match {
            case "amp"  => '&'.toInt
            case "lt"   => '<'.toInt
            case "gt"   => '>'.toInt
            case "quot" => '"'.toInt
            case "apos" => '\''.toInt
            case "nbsp" => ' '.toInt
            case e if e.startsWith("#") =>
              try Integer.parseInt(e.substring(1)) catch { case _: Exception => -1 }
            case _ => -1
          }
          // Reject lone-surrogate and out-of-range codepoints (pass the
          // literal text through deterministically, like any non-entity).
          val valid = decoded >= 0 && decoded <= 0x10FFFF &&
            !(decoded >= 0xD800 && decoded <= 0xDFFF)
          if (valid) {
            if (decoded > 0xFFFF) {
              // Supplementary plane: emit the surrogate pair — truncating
              // via toChar would map e.g. &#128512; to an unrelated BMP char.
              if (pendingSpace && cur.length > 0) cur.append(' ')
              pendingSpace = false
              cur.appendCodePoint(decoded)
            } else appendChar(decoded.toChar)
            i = semi + 1
          } else { appendChar('&'); i += 1 }
        } else { appendChar('&'); i += 1 }
      } else {
        appendChar(c)
        i += 1
      }
    }
    flushBlock()
    blocks.mkString("\n")
  }
}
