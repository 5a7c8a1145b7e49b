package graft

import graft.functions.AhoCorasick
import org.apache.spark.sql.functions._

/** The multi-pattern matcher: exactness vs a naive per-position scan
  * (overlaps included), edge shapes, and the kernel's relational
  * surface. Cross-engine agreement is pinned by the q_keyword_hits /
  * q_keyword_tag DuckDB oracles. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, term: String): Long =
    (0 to text.length - term.length)
      .count(i => text.regionMatches(i, term, 0, term.length)).toLong

  test("overlapping matches: every occurrence is counted") {
    val ac = AhoCorasick(Seq("aa", "a", "aaa"))
    val c = ac.counts("aaaa")
    assert(c.toSeq == Seq(3L, 4L, 2L), s"got ${c.toSeq}")
    // a term that is a suffix of another still reports ("he" in "the")
    val ac2 = AhoCorasick(Seq("the", "he", "e"))
    assert(ac2.counts("the then").toSeq == Seq(2L, 2L, 2L))
  }

  test("property: automaton == naive scan on random binary strings") {
    val dict = Seq("a", "b", "aa", "ab", "ba", "aba", "bab", "aab", "bbb")
    val ac = AhoCorasick(dict)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (0 until rnd.nextInt(40)).map(_ =>
        if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = ac.counts(s).toSeq
      val want = dict.map(naive(s, _))
      assert(got == want, s"text='$s': $got vs $want")
    }
  }

  test("edges: no match, term longer than text, empty text, dup terms") {
    val ac = AhoCorasick(Seq("xyz", "xy", "zz", "xyz"))
    assert(ac.counts("").forall(_ == 0L))
    assert(ac.counts("x").forall(_ == 0L))
    assert(ac.counts("xy").toSeq == Seq(0L, 1L, 0L))
    assert(ac.hits("xyzz") == Seq(("xyz", 1L), ("xy", 1L), ("zz", 1L)))
    intercept[IllegalArgumentException](AhoCorasick(Seq("ok", "")))
  }

  test("phrases cross word boundaries; matching is case-sensitive") {
    val ac = AhoCorasick(Seq("table scan", "scan", "Scan"))
    assert(ac.counts("a table scan then scan").toSeq == Seq(1L, 2L, 0L))
  }

  test("coverMask: union of matched spans, overlap-order independent") {
    val ac = AhoCorasick(Seq("table scan", "scan", "can", "ble"))
    val t = "a table scan here"
    val cover = ac.coverMask(t)
    // "table scan" covers [2,12); "ble"/"scan"/"can" are inside it
    assert(cover.zipWithIndex.forall { case (c, i) => c == (i >= 2 && i < 12) },
      cover.mkString(","))
    // naive reference: a char is covered iff ANY term matches across it
    val dict = Seq("a", "aa", "aba", "b")
    val ac2 = AhoCorasick(dict)
    val s = "abaabbaba"
    val want = (0 until s.length).map(i => dict.exists(term =>
      (0 to s.length - term.length).exists(j =>
        j <= i && i < j + term.length &&
          s.regionMatches(j, term, 0, term.length))))
    assert(ac2.coverMask(s).toSeq == want, s"$s")
    assert(ac.coverMask("").isEmpty)
  }

  test("kernel relational surface: partition-invariant, null-safe") {
    val docs = Seq(
      (1L, "data at the batch"),
      (2L, null.asInstanceOf[String]),
      (3L, "table scan table scan")).toDF("doc_id", "text")
    def rows(parts: Int) = graft.operators.TextOps
      .keywordMatches(docs.repartition(parts), Seq("at", "data", "table scan"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val one = rows(1)
    assert(one == Set((1L, "at", 3L), (1L, "data", 1L),
      (3L, "table scan", 2L)))
    assert(rows(7) == one)
  }
}
