package graft.link

import scala.collection.mutable

/** Compressed token-level alias trie (SURVEY.md §7.2 #5).
  *
  * Built driver-side from the alias dictionary and broadcast to executors;
  * the mention scan walks the trie with longest-match semantics over the
  * token stream. Serializable (shipped inside the broadcast).
  *
  * The reference's analog is the driver-side field-union metadata prepared
  * once and used by every decode task
  * (/root/reference/src/graph_loader.rs:927-976).
  */
final class AliasTrie private (
    private val children: Array[mutable.HashMap[String, Int]],
    private val terminal: Array[Boolean]
) extends Serializable {

  /** Longest match starting at token index `start`; returns the number of
    * tokens consumed (0 = no match). `canExtend(k)` gates whether the match
    * may extend past token `start + k - 1` (used to stop at block/sentence
    * boundaries).
    */
  def longestMatch(tokens: IndexedSeq[String], start: Int,
                   canExtend: Int => Boolean): Int = {
    var node = 0
    var i = start
    var best = 0
    var continue = true
    while (continue && i < tokens.length) {
      children(node).get(tokens(i)) match {
        case Some(next) =>
          node = next
          i += 1
          if (terminal(node)) best = i - start
          // may we consume the next token (no boundary after token i-1)?
          continue = i < tokens.length && canExtend(i - start)
        case None => continue = false
      }
    }
    best
  }

  def size: Int = children.length
}

object AliasTrie {

  /** Build from distinct alias surface forms (each split on single spaces). */
  def build(aliases: Iterable[String]): AliasTrie = {
    val children = mutable.ArrayBuffer[mutable.HashMap[String, Int]](
      mutable.HashMap.empty)
    val terminal = mutable.ArrayBuffer[Boolean](false)
    aliases.foreach { alias =>
      var node = 0
      alias.split(' ').foreach { tok =>
        node = children(node).getOrElseUpdate(tok, {
          children += mutable.HashMap.empty
          terminal += false
          children.length - 1
        })
      }
      terminal(node) = true
    }
    new AliasTrie(children.toArray, terminal.toArray)
  }
}
