package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions.col

/** Round-9 mixture/selection additions: the temperature-scaled mixture
  * planner, the per-source cap, and DSIR-style importance weights. */
class MixturePlanSpec extends SparkSpec {
  import spark.implicits._

  test("temperature mixture: sqrt-flattening boosts thin strata") {
    val rows = CurationOps.mixturePlanTemp(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(rows.size >= 2)
    val total = rows.values.map(_.getAs[Long]("tokens_avail")).sum
    // α=1/2 flattens: every below-average stratum's share exceeds its
    // proportional share, every above-average stratum's share trails it
    rows.values.foreach { r =>
      val avail = r.getAs[Long]("tokens_avail")
      val share = r.getAs[Long]("share_10k")
      val prop = avail * 10000L / total
      if (avail * rows.size < total)
        assert(share > prop, s"thin stratum not boosted: $r (prop $prop)")
      if (avail * rows.size > total)
        assert(share < prop, s"fat stratum not flattened: $r (prop $prop)")
      assert(r.getAs[Long]("w_sqrt") ==
        math.sqrt(avail.toDouble).toLong, s"w_sqrt mismatch: $r")
    }
    // shares are truncations of an exact partition of 10^4
    val shareSum = rows.values.map(_.getAs[Long]("share_10k")).sum
    assert(shareSum <= 10000L && shareSum > 10000L - rows.size)
  }

  test("source cap: exact per-source counts, deterministic, rk contiguous") {
    val got = CurationOps.sourceCapped(spark, sfDir).collect()
    val bySource = got.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= CurationOps.SourceCapN, s"$src over cap")
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq ==
        (1 to rs.length).toSeq, s"$src ranks not contiguous")
    }
    // deterministic md5 order: a second run keeps the identical set
    val again = CurationOps.sourceCapped(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet ==
      again.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("dsir weights: target-vocabulary documents weigh more") {
    // target (en) speaks tgtN..., the other domain speaks othN... —
    // disjoint vocabularies, so en-doc buckets carry high t/r ratios
    val docs = (
      (1L to 20L).map(i => (i, "en",
        (1 to 30).map(j => s"tgt${(i + j) % 7}").mkString(" "))) ++
      (21L to 40L).map(i => (i, "de",
        (1 to 30).map(j => s"oth${(i + j) % 7}").mkString(" ")))
    ).toDF("doc_id", "lang", "text")
    val w = CurationOps.dsirWeightsCore(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("weight_ppm")).toMap
    val tgtMin = (1L to 20L).map(w).min
    val othMax = (21L to 40L).map(w).max
    assert(tgtMin > othMax,
      s"every target doc must outweigh every other-domain doc: $tgtMin vs $othMax")
    // target docs sit near 2e6 (they are ~half the corpus and all of
    // the target), other-domain docs near the smoothing floor
    assert(tgtMin > 1500000L && othMax < 500000L,
      s"separation too weak: $tgtMin / $othMax")
  }

  test("quality percentile: per-lang ranks, tie sharing, singleton zero") {
    // write a tiny documents dir with controlled scores per lang: three
    // clearly-ordered en docs (short gibberish < mid < rich), a tied en
    // pair (identical text => identical q10k), and one singleton de doc
    val rows = Seq(
      (1L, "zz", "en", "s"),
      (2L, "The quick brown fox jumps over the lazy dog; speed counts.",
        "en", "s"),
      (3L, "The quick brown fox jumps over the lazy dog; speed counts.",
        "en", "s"),
      (4L, "A different and much longer passage of flowing prose, in " +
        "which the words keep varying and the sentences stay readable " +
        "to any patient reader of ordinary novels and essays.", "en", "s"),
      (5L, "einzelnes dokument", "de", "s"))
    val dir = "/tmp/graft_qpct_spec"
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.qualityPercentile(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("q10k"), r.getAs[Long]("pct_ppm"))).toMap
    // en: n=4 -> denominators (n-1)=3; ranks_below: worst 0, tied pair
    // SHARE a rank, best has 3 below
    val en = Seq(1L, 2L, 3L, 4L).map(got)
    assert(got(2L) == got(3L), "identical text => identical percentile")
    val worst = en.minBy(_._1); val best = en.maxBy(_._1)
    assert(worst._2 == 0L, s"worst en doc at percentile 0: $got")
    assert(best._2 == 1000000L, s"best en doc at percentile 1e6: $got")
    // the tied pair sits strictly between
    assert(got(2L)._2 > 0L && got(2L)._2 < 1000000L)
    assert(got(5L)._2 == 0L, "singleton stratum reads 0, never divides by 0")
  }

  test("quality floor: keeps the target fraction, ties admitted") {
    val r = CurationOps.qualityBudgetFloor(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    val n = row.getAs[Long]("n_docs")
    val k = row.getAs[Long]("k_target")
    val floor = row.getAs[Long]("floor_q10k")
    val admitted = row.getAs[Long]("n_admitted")
    assert(k == n * CurationOps.QualityKeep10k / 10000L)
    assert(admitted >= k && admitted <= n, s"bad admission count: $row")
    // cross-check against the score relation: admitted must equal the
    // exact count of docs at or above the floor, and the next-higher
    // floor would under-fill the budget
    val scores = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.operators.TextOps.quality10k(
        org.apache.spark.sql.functions.col("text")).as("q10k"))
      .collect().map(_.getLong(0))
    assert(scores.count(_ >= floor).toLong == admitted)
    assert(scores.count(_ > floor).toLong < k,
      "a higher floor would miss the budget — floor must be maximal")
  }

  test("mixture realized: emit bounds, regime behavior, plan reconciliation") {
    val plan = CurationOps.mixturePlan(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val got = CurationOps.mixtureRealized(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == plan.keySet)
    for (lang <- got.keySet) {
      val (p, g) = (plan(lang), got(lang))
      val epochs = p.getAs[Long]("epochs_100")
      val base = epochs / 100
      val (nd, nc) = (g.getAs[Long]("n_docs"), g.getAs[Long]("n_copies"))
      val (ta, te) = (g.getAs[Long]("tok_avail"), g.getAs[Long]("tok_emitted"))
      assert(ta == p.getAs[Long]("tokens_avail"), s"$lang avail: $g vs $p")
      // every doc emits base or base+1 copies — hard envelope
      assert(nc >= base * nd && nc <= (base + 1) * nd, s"$lang copies: $g")
      assert(te >= base * ta && te <= (base + 1) * ta, s"$lang tokens: $g")
      // regimes: whole epochs repeat, pure thinning never exceeds 1 copy
      if (epochs >= 100) assert(nc >= nd, s"$lang oversample must repeat: $g")
      if (epochs < 100) assert(nc <= nd, s"$lang thinning emits <=1 each: $g")
    }
    // deterministic coin: a second run is identical
    val again = CurationOps.mixtureRealized(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_copies")).toMap
    assert(got.view.mapValues(_.getAs[Long]("n_copies")).toMap == again)
  }

  test("mixture realized: sub-1% strata emit at 1e-4 coin granularity") {
    // ADVICE r10 (medium): at percent granularity a stratum whose
    // planned rate is under 1% has epochs_100 = 0 and emitted ZERO
    // copies. A tiny token budget puts every stratum in that window;
    // the realizer must still emit by the 1e-4 fractional coin —
    // pinned here by replaying the exact md5 coin per document.
    val target = 50L
    val plan = CurationOps.mixturePlan(spark, sfDir, target).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("epochs_100"),
        r.getAs[Long]("tokens_needed"), r.getAs[Long]("tokens_avail"))))
      .toMap
    assert(plan.values.exists { case (e, n, a) =>
      e == 0 && n * 10000 / a > 0
    }, s"fixture must land a stratum in the (0,1%) window: $plan")
    def coin24(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6), 16)
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang").collect()
    val expected = docs.groupBy(_.getString(1)).map { case (lang, rows) =>
      val (e, n, a) = plan(lang)
      val frac = n * 10000 / a - (e / 100) * 10000
      lang -> rows.map { r =>
        e / 100 +
          (if (coin24(r.getLong(0)) * 10000 < 16777216L * frac) 1L else 0L)
      }.sum
    }
    val got = CurationOps.mixtureRealized(spark, sfDir, target).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_copies")).toMap
    assert(got == expected, s"$got vs $expected")
  }

  test("dsir sample: deterministic, target-domain enriched, bounded") {
    // the weights fixture one scale up: en speaks the target vocabulary,
    // de a disjoint one — en weights land near 2e6, de near the floor,
    // so the resampler must accept en at a visibly higher rate
    val docs = (
      (1L to 40L).map(i => (i, "en",
        (1 to 30).map(j => s"tgt${(i + j) % 7}").mkString(" "))) ++
      (41L to 80L).map(i => (i, "de",
        (1 to 30).map(j => s"oth${(i + j) % 7}").mkString(" ")))
    ).toDF("doc_id", "lang", "text")
    val s1 = CurationOps.dsirSampleCore(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val s2 = CurationOps.dsirSampleCore(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(s1.keySet == Set("en", "de"))
    for (lang <- s1.keySet) {
      val (a, b) = (s1(lang), s2(lang))
      assert(a.getAs[Long]("n_sampled") == b.getAs[Long]("n_sampled") &&
        a.getAs[Long]("tok_sampled") == b.getAs[Long]("tok_sampled"),
        s"md5-coin sampling must be replay-identical: $a vs $b")
      assert(a.getAs[Long]("n_sampled") <= a.getAs[Long]("n_docs"))
      assert(a.getAs[Long]("tok_sampled") <= a.getAs[Long]("tok_total"))
    }
    // enrichment: with weights separated ~2e6 vs ~2e5, the en accept
    // rate must dominate (en's scaled weight clears 1 — all accepted)
    val rEn = s1("en").getAs[Long]("n_sampled").toDouble /
      s1("en").getAs[Long]("n_docs")
    val rDe = s1("de").getAs[Long]("n_sampled").toDouble /
      s1("de").getAs[Long]("n_docs")
    assert(rEn > rDe, s"target domain must be enriched: en $rEn vs de $rDe")
  }

  test("dsir sample: uniform weights realize the target share") {
    // one shared vocabulary, all en: every weight ≈ 1e6, so the accept
    // probability collapses to DsirShare10k/1e4 for every doc — the
    // realized share must sit within binomial noise of the target
    val n = 400
    val docs = (1L to n.toLong).map(i =>
      (i, "en", (1 to 20).map(j => s"w${(i * 3 + j) % 11}").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val row = CurationOps.dsirSampleCore(docs).collect().head
    val share = CurationOps.DsirShare10k.toDouble / 10000.0
    val got = row.getAs[Long]("n_sampled").toDouble / n
    val sigma = math.sqrt(share * (1 - share) / n)
    assert(math.abs(got - share) <= 4 * sigma + 0.02,
      s"uniform corpus must realize ~$share, got $got")
  }

  test("dsir weights: uniform corpus weighs ~1e6 everywhere") {
    val docs = (1L to 30L).map(i =>
      (i, if (i % 2 == 0) "en" else "de",
        (1 to 20).map(j => s"w${(i * 3 + j) % 11}").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    CurationOps.dsirWeightsCore(docs).collect().foreach { r =>
      val w = r.getAs[Long]("weight_ppm")
      assert(w > 500000L && w < 2000000L, s"shared-vocab weight off: $r")
    }
  }
  test("anneal schedule: per-phase shares stay within budget, the main " +
      "phase flattens the head language, the phase table sums to 10^4") {
    import graft.operators.CurationOps
    assert(CurationOps.AnnealPhases.map(_._3).sum == 10000L)
    val rows = CurationOps.annealSchedule(spark, sfDir).collect()
    val byPhase = rows.groupBy(_.getAs[Int]("phase"))
    assert(byPhase.keySet == Set(0, 1, 2))
    byPhase.foreach { case (ph, rs) =>
      // floor division: shares sum to at most 10^4, within langs slack
      val sh = rs.map(_.getAs[Long]("share_10k")).sum
      assert(sh <= 10000L && sh > 10000L - 2L * rs.length, s"phase $ph: $sh")
      rs.foreach(r => assert(r.getAs[Long]("tokens_planned") >= 0))
    }
    // the curriculum property: sqrt-temperature (main) gives the head
    // language a SMALLER share than its natural (warmup) share, and
    // every thin language a larger one
    val nat = byPhase(0).map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("share_10k")).toMap
    val mainP = byPhase(1).map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("share_10k")).toMap
    val head = nat.maxBy(_._2)._1
    assert(mainP(head) < nat(head),
      s"sqrt temperature must flatten the head language: $head")
    assert(nat.keys.filter(_ != head).forall(l => mainP(l) >= nat(l)),
      "thin languages must not lose share under sqrt temperature")
  }
}
