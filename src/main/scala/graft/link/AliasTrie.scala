package graft.link

import scala.collection.mutable

/** Compressed alias trie (SURVEY.md §7.2 #5) — char-level, allocation-free
  * matching.
  *
  * Built driver-side from the alias dictionary and broadcast to executors.
  * The match loop walks the text's chars directly against a flat int-matrix
  * trie: no tokenization, no substring allocation — the scan stage's
  * allocation rate is what gates multi-core scaling on a 32-thread
  * executor, so the hot loop allocates nothing until a mention is found.
  *
  * Semantics (token-level longest match):
  *  - a match must start at a token boundary and end at one (an alias never
  *    matches inside a longer alphanumeric run);
  *  - multi-token aliases are single-space separated, so a match can never
  *    cross '\n' (block) or multi-space gaps — the trie only walks ' '.
  *
  * The reference's analog is the driver-side field-union metadata prepared
  * once and used by every decode task
  * (/root/reference/src/graph_loader.rs:927-976).
  */
final class AliasTrie private (
    private val next: Array[Array[Int]], // [node][char] -> node | -1
    private val terminal: Array[Boolean]
) extends Serializable {

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c.isLetterOrDigit

  /** Longest alias match starting at `start` (must be a token boundary).
    * Returns the exclusive end offset of the match, or -1.
    */
  def matchEnd(text: String, start: Int): Int = {
    var node = 0
    var i = start
    var best = -1
    val n = text.length
    var cont = true
    while (cont && i < n) {
      val c = text.charAt(i)
      val nxt = if (c < 128) next(node)(c) else -1
      if (nxt < 0) cont = false
      else {
        node = nxt
        i += 1
        if (terminal(node) && (i >= n || !isTokenChar(text.charAt(i))))
          best = i
      }
    }
    if (cont && i == n && terminal(node)) best = i
    best
  }

  def size: Int = next.length
}

object AliasTrie {

  /** Build from distinct alias surface forms (ASCII letters/digits/space). */
  def build(aliases: Iterable[String]): AliasTrie = {
    val next = mutable.ArrayBuffer[Array[Int]](Array.fill(128)(-1))
    val terminal = mutable.ArrayBuffer[Boolean](false)
    aliases.foreach { alias =>
      var node = 0
      var i = 0
      while (i < alias.length) {
        val c = alias.charAt(i)
        require(c < 128, s"non-ASCII alias unsupported: $alias")
        if (next(node)(c) < 0) {
          next += Array.fill(128)(-1)
          terminal += false
          next(node)(c) = next.length - 1
        }
        node = next(node)(c)
        i += 1
      }
      terminal(node) = true
    }
    new AliasTrie(next.toArray, terminal.toArray)
  }
}
