package graft

import graft.operators.TextOps

/** Pins the exact substring-run pass (Lee et al. "Deduplicating
  * Training Data"): planted long shared spans are measured EXACTLY
  * (length and both offsets), sub-bar runs stay out, multiple spans
  * resolve to the maximum — and the winnow overlap score, which only
  * detects the pairs fractionally, is visibly not a span length. */
class SharedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int) =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("planted 60-token run: exact span + offsets; 10-token run excluded") {
    val run = toks("run", 60)
    val short = toks("shrt", 10)
    val docs = Seq(
      (1L, "en", s"${toks("a", 20)} $run ${toks("b", 5)} $short"),
      (2L, "en", s"${toks("c", 5)} $run ${toks("d", 30)}"),
      (3L, "en", s"${toks("e", 40)} $short ${toks("f", 10)}")
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.sharedSpansCore(spark, docs, 15).collect()
    assert(got.length == 1, got.mkString("; "))
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 60L, s"span must be exactly 60: $r")
    // run1 is the 21st token of doc 1 and the 6th of doc 2
    assert(r.getLong(3) == 21L && r.getLong(4) == 6L, s"$r")
    // the winnow pass detects the pair but scores it FRACTIONALLY —
    // the span pass is what turns detection into an actionable length
    val ov = TextOps.winnowOverlapBestCore(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(ov(1L).getLong(1) == 2L)
    assert(ov(1L).getDouble(2) < 1.0,
      s"winnow scores a containment ratio, not a span: ${ov(1L)}")
  }

  test("two shared spans resolve to the maximal one") {
    val r1 = toks("p", 20)
    val r2 = toks("q", 30)
    val docs = Seq(
      (10L, s"$r1 ${toks("x", 8)} $r2"),
      (20L, s"${toks("y", 12)} $r2 ${toks("z", 8)} $r1")
    ).toDF("doc_id", "text")
    val got = TextOps.sharedSpansCore(spark, docs, 15).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) == 30L, s"must report the 30-token span: $r")
    // q1 is the 29th token of doc 10 and the 13th of doc 20
    assert(r.getLong(3) == 29L && r.getLong(4) == 13L, s"$r")
  }

  test("candidate-restricted form is identical to the direct form") {
    // the production restriction (positional join bounded to winnow
    // candidate pairs) must change the PLAN, never the answer — pinned
    // on the planted fixture and on the real sf corpus
    val run = toks("run", 40)
    val fixture = Seq(
      (1L, "en", s"${toks("a", 10)} $run"),
      (2L, "en", s"$run ${toks("b", 25)}"),
      (3L, "en", toks("c", 50)),
      (4L, "en", s"${toks("d", 30)} ${toks("e", 30)}")
    ).toDF("doc_id", "lang", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(TextOps.sharedSpansCandidatesCore(spark, fixture, 15)) ==
      rows(TextOps.sharedSpansCore(spark, fixture, 15)))
    val corpus = graft.sources.Tables.documents(spark, sfDir)
    val direct = rows(TextOps.sharedSpansCore(spark, corpus,
      TextOps.SpanBarTokens))
    assert(rows(TextOps.sharedSpansCandidatesCore(spark, corpus,
      TextOps.SpanBarTokens)) == direct)
    assert(direct.nonEmpty, "the corpus pin must exercise real pairs")
  }

  test("span scrub: the later doc loses the span, the first keeps it") {
    val run = toks("run", 60)
    val docs = Seq(
      (1L, "en", s"${toks("a", 20)} $run"),
      (2L, "en", s"${toks("c", 5)} $run ${toks("d", 10)}"),
      (3L, "en", toks("e", 30))).toDF("doc_id", "lang", "text")
    val got = TextOps.spanScrubCore(spark, docs, 15).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "every doc emits a verdict row")
    assert(got(1L).getAs[Long]("n_removed") == 0L, s"${got(1L)}")
    assert(got(2L).getAs[Long]("n_removed") == 60L, s"${got(2L)}")
    assert(got(3L).getAs[Long]("n_removed") == 0L)
    // doc 2's surviving text is exactly its own tokens minus the run
    val kept = ((1 to 5).map(i => s"c$i") ++ (1 to 10).map(i => s"d$i"))
      .mkString(" ")
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(kept.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(2L).getAs[String]("scrubbed_fp") == want)
  }

  test("bar prunes short documents before any join work") {
    // both docs share their ENTIRE 10-token text — but under a 15-token
    // bar neither can hold a qualifying span, so the pass emits nothing
    val docs = Seq(
      (1L, toks("w", 10)), (2L, toks("w", 10))).toDF("doc_id", "text")
    assert(TextOps.sharedSpansCore(spark, docs, 15).collect().isEmpty)
    // and at a bar they do clear, the full-doc span surfaces
    val got = TextOps.sharedSpansCore(spark, docs, 10).collect()
    assert(got.length == 1 && got.head.getLong(2) == 10L)
  }
}
