package graft.functions

import scala.collection.mutable

/** Classic Aho–Corasick multi-pattern automaton (Aho & Corasick 1975)
  * — the single-pass answer to "count every occurrence of every
  * blocklist phrase in every document": one automaton walk per text
  * regardless of pattern count, vs one scan PER PATTERN for the naive
  * plan. Matching is substring-level and OVERLAPPING (every (end
  * position, pattern) occurrence counts, nested suffix matches
  * included via dictionary/output links) — the same semantics as the
  * brute-force position scan the DuckDB oracle runs.
  *
  * Built per partition inside `mapPartitions` from a broadcast-small
  * pattern list (never serialized; construction is O(Σ|p|·σ) with the
  * BFS failure-link pass), then shared across the partition's rows —
  * at 100 TB the automaton is built once per task for millions of
  * documents.
  */
final class AhoCorasick(patterns: IndexedSeq[String]) {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "empty pattern list or empty pattern")

  // trie: node → (char → child); node 0 is the root
  private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val terminal = mutable.ArrayBuffer(List.empty[Int])
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    p.foreach { c =>
      node = children(node).get(c) match {
        case Some(n) => n
        case None =>
          children += mutable.Map.empty[Char, Int]
          terminal += Nil
          children(node)(c) = children.length - 1
          children.length - 1
      }
    }
    terminal(node) = pi :: terminal(node)
  }

  // failure links + aggregated output lists, BFS order
  private val fail = Array.fill(children.length)(0)
  private val out = Array.fill(children.length)(List.empty[Int])
  locally {
    val queue = mutable.Queue.empty[Int]
    out(0) = terminal(0)
    children(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) = terminal(u) ++ out(fail(u))
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = children(f).getOrElse(ch, 0)
        if (fail(v) == v) fail(v) = 0
        queue += v
      }
    }
  }

  /** Per-pattern occurrence counts over `text` (overlapping included). */
  def countMatches(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (node != 0 && !children(node).contains(c)) node = fail(node)
      node = children(node).getOrElse(c, 0)
      var o = out(node)
      while (o.nonEmpty) { counts(o.head) += 1; o = o.tail }
      i += 1
    }
    counts
  }
}
