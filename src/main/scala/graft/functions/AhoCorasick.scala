package graft.functions

import scala.collection.mutable

/** Aho-Corasick multi-pattern matcher — the kernel behind the keyword
  * tagging / blocklist operators ([[graft.operators.TextOps.keywordTag]]).
  *
  * Why an automaton and not SQL: a dictionary term can be a MULTI-WORD
  * PHRASE ("free money now"), so the exploded-token equi-join that
  * serves single-word lookups cannot express it; `contains`/`regexp`
  * per term re-scans the document once PER TERM — O(len · |dict|),
  * hopeless at a 100k-phrase blocklist. The automaton scans each
  * document ONCE: O(len + matches) regardless of dictionary size,
  * finding every occurrence of every term, including overlapping ones
  * ("he" inside "the", "aa" ×3 in "aaaa").
  *
  * Counting is per-term via the REPORT CHAIN (dictionary suffix
  * links): at each position the scan bumps one node counter; term
  * totals aggregate node counters through each node's chain of
  * dictionary suffixes afterwards, so the scan itself never walks
  * match lists — O(len) even on pathological inputs where every
  * position matches many terms (counts accumulate in O(nodes) at the
  * end instead of O(matches) during the scan).
  *
  * Scale shape: the automaton builds ONCE on the driver (goto maps +
  * BFS fail links, O(total term chars)) and ships as a broadcast —
  * ~100 bytes/node, a 100k-term blocklist is a few MB; executors scan
  * partitions independently (embarrassingly parallel, no shuffle).
  * Matching is exact on characters (case- and boundary-sensitive);
  * callers canonicalize first (lower / [[graft.plans.StripAccents]])
  * when they want folded semantics.
  */
final class AhoCorasick private (
    gotoMaps: Array[Map[Char, Int]],
    fail: Array[Int],
    // term id ending at this node, or -1
    termAt: Array[Int],
    // nearest proper suffix of this node that IS a term (report chain)
    dictLink: Array[Int],
    val terms: Array[String]) extends Serializable {

  /** Per-term occurrence counts in `text` (ALL occurrences, including
    * overlapping). Index i counts `terms(i)`. */
  def counts(text: String): Array[Long] = {
    val nodeHits = new Array[Long](fail.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      // follow fail links until a goto exists (root loops to itself)
      var g = gotoMaps(s).getOrElse(c, -1)
      while (g < 0 && s != 0) {
        s = fail(s)
        g = gotoMaps(s).getOrElse(c, -1)
      }
      s = if (g >= 0) g else 0
      nodeHits(s) += 1L
      i += 1
    }
    // aggregate node visit counts down each report chain: a visit to a
    // node is an occurrence of every dictionary suffix on its chain
    val out = new Array[Long](terms.length)
    var v = nodeHits.length - 1
    while (v >= 0) {
      if (nodeHits(v) > 0L) {
        var u = if (termAt(v) >= 0) v else dictLink(v)
        while (u > 0) {
          out(termAt(u)) += nodeHits(v)
          u = dictLink(u)
        }
      }
      v -= 1
    }
    out
  }

  /** (term, count) pairs with count > 0 — the kernel's relational shape. */
  def hits(text: String): Seq[(String, Long)] = {
    val c = counts(text)
    terms.indices.collect { case i if c(i) > 0 => (terms(i), c(i)) }
  }

  /** Character positions covered by ANY match — the union of matched
    * spans, which is deterministic whatever the overlap structure (the
    * scrub action's contract). Same single scan as [[counts]]; at each
    * position the report chain contributes [end-len+1, end] intervals,
    * merged into a boolean cover. O(len + Σ match lengths). */
  def coverMask(text: String): Array[Boolean] = {
    val cover = new Array[Boolean](text.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var g = gotoMaps(s).getOrElse(c, -1)
      while (g < 0 && s != 0) {
        s = fail(s)
        g = gotoMaps(s).getOrElse(c, -1)
      }
      s = if (g >= 0) g else 0
      var u = if (termAt(s) >= 0) s else dictLink(s)
      while (u > 0) {
        var j = i - terms(termAt(u)).length + 1
        while (j <= i) { cover(j) = true; j += 1 }
        u = dictLink(u)
      }
      i += 1
    }
    cover
  }

  def size: Int = fail.length
}

object AhoCorasick {

  /** Build the automaton from a dictionary. Duplicate terms collapse;
    * empty terms are rejected (they would match at every position). */
  def apply(dict: Seq[String]): AhoCorasick = {
    val terms = dict.distinct.toArray
    require(terms.forall(_.nonEmpty), "empty dictionary term")
    val gotos = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val termAt = mutable.ArrayBuffer(-1)
    // trie
    terms.zipWithIndex.foreach { case (t, ti) =>
      var s = 0
      t.foreach { c =>
        s = gotos(s).getOrElseUpdate(c, {
          gotos += mutable.HashMap.empty[Char, Int]
          termAt += -1
          gotos.length - 1
        })
      }
      termAt(s) = ti
    }
    // BFS fail + dictionary links
    val n = gotos.length
    val fail = new Array[Int](n)
    val dict0 = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    gotos(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      dict0(u) =
        if (termAt(fail(u)) >= 0) fail(u) else dict0(fail(u))
      gotos(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotos(f).contains(c)) f = fail(f)
        fail(v) = gotos(f).get(c).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
    new AhoCorasick(gotos.map(_.toMap).toArray, fail, termAt.toArray,
      dict0, terms)
  }
}
