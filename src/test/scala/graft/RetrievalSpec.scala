package graft

import graft.operators.{CurationOps, TextOps, VectorOps}

/** Round-12 retrieval additions: integer-exact BM25 (hand-scored on a
  * planted corpus against an independent re-implementation of the
  * fixed-point formula) and the BM25 ⊕ cosine reciprocal-rank fusion. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  /** Independent eighth-octave log2 (the spec's own tiny copy, so a
    * TextOps.log2x8 regression cannot hide from its own test). */
  private def l8(x: Long): Long = {
    val s = x.toBinaryString
    (s.length - 1) * 8L +
      s.drop(1).padTo(3, '0').take(3).foldLeft(0L)((a, c) => a * 2 + (c - '0'))
  }

  /** The BM25 fixed-point formula, recomputed from scratch. */
  private def score(tfs: Map[String, Long], dl: Long, nDocs: Long,
      sTok: Long, dfs: Map[String, Long], terms: Seq[String]): Long = {
    val a = sTok / nDocs
    terms.map { t =>
      val tf = tfs.getOrElse(t, 0L)
      if (tf == 0) 0L
      else {
        val idf8 = l8((2 * nDocs + 2) * (1L << 20) / (2 * dfs(t) + 1)) - 160L
        (idf8 * 22 * a * tf) / (10 * a * tf + 3 * a + 9 * dl)
      }
    }.sum
  }

  test("bm25: planted corpus matches the independent fixed-point scorer") {
    val docs = Seq(
      (1L, "en", "aa bb cc"),
      (2L, "en", "aa aa aa dd"),
      (3L, "en", "bb bb ee ff gg"),
      (4L, "en", "hh ii jj kk")).toDF("doc_id", "lang", "text")
    val terms = Seq("aa", "bb")
    val dfs = Map("aa" -> 2L, "bb" -> 2L)
    val exp = Map(
      1L -> score(Map("aa" -> 1L, "bb" -> 1L), 3, 4, 16, dfs, terms),
      2L -> score(Map("aa" -> 3L), 4, 4, 16, dfs, terms),
      3L -> score(Map("bb" -> 2L), 5, 4, 16, dfs, terms),
      4L -> 0L)
    val got = TextOps.bm25Scored(docs, terms)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bm25_x8")).toMap
    assert(got === exp, s"got $got expected $exp")
    assert(exp(1L) > 0L, "both-term doc must score positive")
  }

  test("bm25: rare term outranks common, tf saturates sublinearly") {
    // 'rare' in 1 of 12 docs, 'comm' in 11 of 12
    val filler = (1 to 10).map(i => (100L + i, "en", "comm xx yy zz"))
    val docs = (Seq(
      (1L, "en", "rare xx yy zz"),
      (2L, "en", "comm xx yy zz"),
      (3L, "en", "rare rare rare rare rare rare rare rare rare rare"),
      (4L, "en", "rare xx yy zz aa bb cc dd ee ff")) ++ filler)
      .toDF("doc_id", "lang", "text")
    val got = TextOps.bm25Scored(docs, Seq("rare", "comm"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bm25_x8")).toMap
    assert(got(1L) > got(2L),
      s"rare-term doc must outrank common-term doc at equal tf/dl: $got")
    // tf=10 (all-rare doc, dl=10) vs tf=1 (dl=10): saturation keeps the
    // ratio far below 10x
    assert(got(3L) > got(4L) && got(3L) < 5 * got(4L),
      s"tf=10 must score above tf=1 but sublinearly: $got")
  }

  test("bm25ScoredPerTerm: per-term rows equal single-term bm25Scored") {
    // the r19 retrievalEval rewrite rests on this equivalence: one
    // multi-term stats+score pass must emit, per term, exactly the
    // single-term bm25Scored scores (same n_docs/s_tok/avgdl, per-term
    // df/tf/idf8 through the same all-long formula)
    val docs = Seq(
      (1L, "en", "aa bb cc"),
      (2L, "en", "aa aa aa dd"),
      (3L, "en", "bb bb ee ff gg"),
      (4L, "en", "hh ii jj kk")).toDF("doc_id", "lang", "text")
    val terms = Seq("aa", "bb", "zz")
    val multi = TextOps.bm25ScoredPerTerm(docs, terms)
      .collect()
      .map(r => (r.getAs[Int]("term_idx"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("bm25_x8")).toMap
    terms.zipWithIndex.foreach { case (t, i) =>
      val single = TextOps.bm25Scored(docs, Seq(t))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("bm25_x8")).toMap
      single.foreach { case (d, sc) =>
        assert(multi((i, d)) === sc,
          s"term $t doc $d: multi ${multi((i, d))} != single $sc")
      }
    }
    assert(multi.size === terms.size * 4, "one row per (term, doc)")
  }

  test("rrf fusion: formula, rank bounds, and arm agreement on sf0.001") {
    val rows = CurationOps.rrfFusion(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= CurationOps.RrfTopK)
    rows.foreach { r =>
      val bm = Option(r.getAs[Any]("bm25_rank")).map(_.asInstanceOf[Int])
      val cs = Option(r.getAs[Any]("cos_rank")).map(_.asInstanceOf[Int])
      val exp = bm.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        cs.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_ppm") === exp, s"rrf formula mismatch: $r")
      assert(bm.forall(x => x >= 1 && x <= CurationOps.RrfDepth))
      assert(cs.forall(x => x >= 1 && x <= CurationOps.RrfDepth))
      assert(bm.nonEmpty || cs.nonEmpty)
    }
    // fused order is (rrf desc, doc_id)
    val key = rows.map(r => (-r.getAs[Long]("rrf_ppm"), r.getLong(0)))
    assert(key.sameElements(key.sorted), "fusion output must be ranked")
  }

  test("bm25 index serve: stored-stats form equals the one-shot form") {
    val oneShot = TextOps.bm25TopK(spark, sfDir).collect().toSeq
    val served = TextOps.prodBm25TopK(spark, sfDir).collect().toSeq
    assert(oneShot === served,
      "index-served BM25 must be result-identical to the inline form")
    assert(oneShot.nonEmpty)
  }

  test("hard negatives: triples exclude the dense top-k, ranks bounded") {
    val rows = CurationOps.hardNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty, "probe docs must mine at least one triple")
    val dense = VectorOps.knnBruteForce(spark, sfDir,
        k = CurationOps.HnLexK, nQueries = CurationOps.HnQueries)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    rows.foreach { r =>
      val q = r.getLong(0)
      assert(r.getAs[Int]("dense_rank") <= CurationOps.HnPosK)
      val nr = r.getAs[Int]("neg_rank")
      assert(nr >= 1 && nr <= CurationOps.HnNegK)
      assert(!dense.contains((q, r.getAs[Long]("neg_id"))),
        s"hard negative must not be a dense neighbor: $r")
      assert(r.getAs[Long]("neg_id") >= CurationOps.HnQueries
        && r.getAs[Long]("pos_id") >= CurationOps.HnQueries,
        s"probe docs never appear as positives or negatives: $r")
    }
    // triples are the full pos x neg grid per query
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val nPos = rs.map(_.getAs[Long]("pos_id")).distinct.length
      val nNeg = rs.map(_.getAs[Long]("neg_id")).distinct.length
      assert(rs.length === nPos * nNeg, "pos x neg grid must be complete")
    }
  }
  test("retrieval eval: planted qrels measure the fusion win — RRF " +
      "recall strictly beats both arms where their blind spots differ") {
    val got = CurationOps.retrievalEval(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("bm25", "dense", "rrf"))
    val hits = got.view.mapValues(_.getAs[Long]("hits_at10")).toMap
    // the lexical arm is blind to the d % 3 == 0 relevants (no marker),
    // the dense arm to the odd ones; only d % 6 == 3 escapes both
    assert(hits("rrf") > hits("bm25"),
      s"fusion must beat the lexical arm: $hits")
    assert(hits("rrf") > hits("dense"),
      s"fusion must beat the dense arm: $hits")
    // the lexical arm ranks a relevant doc first on every query (MRR
    // = 1 exactly, in ppm); the dense arm misses the odd-parity
    // queries entirely (MRR = 3/5)
    assert(got("bm25").getAs[Long]("mrr_ppm") == 1000000L)
    assert(got("dense").getAs[Long]("mrr_ppm") == 600000L)
    // recall is exact-integer: hits * 100 div n_rel
    got.values.foreach { r =>
      assert(r.getAs[Int]("recall_pct") ==
        (r.getAs[Long]("hits_at10") * 100 / r.getAs[Long]("n_rel")).toInt)
    }
  }
}
