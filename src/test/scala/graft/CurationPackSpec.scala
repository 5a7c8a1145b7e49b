package graft

import graft.operators.{CurationOps, DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-5 curation additions: Gopher-style repetition signals, sequence
  * packing, and canonical-document selection over dup groups. */
class CurationPackSpec extends SparkSpec {
  import spark.implicits._

  test("repetition: hand-computed fractions and flags") {
    // "a a a a b": top token 4/5 = 0.8; bigrams [a a, a a, a a, a b]
    // -> 2 distinct of 4 -> dup fraction 0.5. Both over the bar.
    // "all words unique here now": top 1/5 = 0.2 (NOT > 0.2), dup 0.
    val docs = Seq(
      (1L, "en", "a a a a b"),
      (2L, "en", "all words unique here now"),
      (3L, "en", ""),
      (4L, "en", "solo"))
      .toDF("doc_id", "lang", "text")
    val got = TextOps.repetitionCore(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("top_word_frac") == 0.8)
    assert(got(1L).getAs[Double]("dup_2gram_frac") == 0.5)
    assert(got(1L).getAs[Boolean]("repetitive"))
    assert(got(2L).getAs[Double]("top_word_frac") == 0.2)
    assert(got(2L).getAs[Double]("dup_2gram_frac") == 0.0)
    assert(!got(2L).getAs[Boolean]("repetitive"))
    // empty doc: no tokens, no bigrams, not repetitive (no div-by-zero)
    assert(got(3L).getAs[Long]("n_tok") == 0L
      && !got(3L).getAs[Boolean]("repetitive"))
    // single token: top fraction 1.0 (pure repetition), no bigrams
    assert(got(4L).getAs[Double]("top_word_frac") == 1.0
      && got(4L).getAs[Boolean]("repetitive"))
  }

  test("repetition: corpus-wide invariants at sf0.001") {
    val rows = TextOps.repetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getAs[Double]("top_word_frac")
      val dup = r.getAs[Double]("dup_2gram_frac")
      assert(top >= 0.0 && top <= 1.0 && dup >= 0.0 && dup <= 1.0,
        s"fractions out of range: $r")
    }
  }

  test("sequence packing: preservation, budget bound, determinism") {
    val docs = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", "w " * (i % 37 + 1).toInt))
      .toDF("doc_id", "lang", "text")
    val tok = size(filter(split(col("text"), " "), t => t =!= ""))
      .cast("long")
    val packed = CurationOps.packSequences(docs, "doc_id", "lang", tok,
      budget = 64L, shards = 4)
    val rows = packed.collect()
    // every doc lands in exactly one sequence; token totals preserved
    assert(rows.length == 200)
    assert(rows.map(_.getAs[Long]("tok")).sum ==
      (1L to 200L).map(i => i % 37 + 1).sum)
    // a sequence never overruns the budget by a full document: the
    // member that closes it STARTED inside the budget
    val bySeq = rows.groupBy(r => (r.getAs[String]("lang"),
      r.getAs[Int]("shard"), r.getAs[Long]("seq_id")))
    bySeq.foreach { case (k, ms) =>
      val total = ms.map(_.getAs[Long]("tok")).sum
      // the CLOSING member is the max-doc_id row (packing order is
      // doc_id); subtracting the max TOKEN count instead would accept a
      // sequence whose closer started outside the budget
      val closerTok = ms.maxBy(_.getAs[Long]("doc_id")).getAs[Long]("tok")
      assert(total - closerTok < 64L,
        s"seq $k: $total tokens, closer started at ${total - closerTok}")
    }
    // deterministic: identical assignment on re-run
    val again = CurationOps.packSequences(docs, "doc_id", "lang", tok,
      budget = 64L, shards = 4).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // an over-budget doc may close the sequence it lands in (first-fit:
    // earlier docs can precede it) but pushes every LATER doc of its
    // shard into a fresh sequence
    val giant = Seq((101L, "de", "g " * 200)).toDF("doc_id", "lang", "text")
    val withGiant = CurationOps.packSequences(
      docs.where(col("doc_id") =!= 101L).union(giant), "doc_id",
      "lang", tok, budget = 64L, shards = 4)
    val g = withGiant.where(col("doc_id") === 101L).head()
    val mates = withGiant
      .where(col("lang") === g.getAs[String]("lang")
        && col("shard") === g.getAs[Int]("shard")
        && col("seq_id") === g.getAs[Long]("seq_id"))
      .collect()
    assert(mates.exists(_.getAs[Long]("doc_id") == 101L)
      && mates.forall(_.getAs[Long]("doc_id") <= 101L),
      s"no doc after the over-budget one may share its sequence: " +
        mates.map(_.getAs[Long]("doc_id")).toSeq.sorted.mkString(","))
  }

  test("boilerplate: cross-doc shingle frequency drives the flag") {
    // shingle "x y z" appears in docs 1..3 (> bar 2); each doc also has
    // a unique tail shingle, so boiler_frac is a real fraction
    val docs = Seq(
      (1L, "en", "x y z a1 b1"),
      (2L, "en", "x y z a2 b2"),
      (3L, "en", "x y z a3 b3"),
      (4L, "en", "p q r s t"))
      .toDF("doc_id", "lang", "text")
    val got = TextOps.boilerplateCore(docs, docBar = 2L).collect()
      .map(r => r.getLong(0) -> r).toMap
    // 5 tokens -> 3 shingles; exactly one ("x y z") is boilerplate
    (1L to 3L).foreach { id =>
      assert(got(id).getAs[Long]("n_sh") == 3L
        && got(id).getAs[Long]("n_boiler") == 1L
        && got(id).getAs[Double]("boiler_frac") == 0.3333
        && got(id).getAs[Boolean]("boiler_heavy"),
        s"doc $id: ${got(id)}")
    }
    assert(got(4L).getAs[Long]("n_boiler") == 0L
      && got(4L).getAs[Double]("boiler_frac") == 0.0
      && !got(4L).getAs[Boolean]("boiler_heavy"))
  }

  test("source profile: per-source counts reconcile with the corpus") {
    val prof = CurationOps.sourceProfile(spark, sfDir).collect()
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(prof.map(_.getAs[Long]("n_docs")).sum == docs.count())
    prof.foreach { r =>
      assert(r.getAs[Long]("n_uniq_fp") <= r.getAs[Long]("n_docs"))
      val q = r.getAs[Double]("avg_quality")
      assert(q >= 0.0 && q <= 1.2, s"quality out of range: $r")
    }
  }

  test("length quantiles: histogram selection equals sorted-rank picks") {
    val got = TextOps.lengthQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    // brute-force reference: sort each lang's token counts, pick the
    // smallest value whose 1-based rank r satisfies 100r >= p*n
    val byLang = TextOps.textStats(spark, sfDir)
      .select(col("lang"), col("n_tokens")).collect()
      .map(r => r.getString(0) -> r.getInt(1).toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    def rank(v: Vector[Long], p: Int): Long =
      v((math.ceil(v.size * p / 100.0) - 1).toInt.max(0))
    byLang.foreach { case (lang, v) =>
      val r = got(lang)
      assert(r.getAs[Long]("n_docs") == v.size)
      assert(r.getAs[Long]("p50") == rank(v, 50), s"$lang p50")
      assert(r.getAs[Long]("p90") == rank(v, 90), s"$lang p90")
      assert(r.getAs[Long]("p99") == rank(v, 99), s"$lang p99")
    }
  }

  test("dup rate by source: reconciles with group membership") {
    val rates = DedupOps.dupRateBySource(spark, sfDir).collect()
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(rates.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // exactly one keep per group survives, so corpus-wide drops =
    // group members - number of groups (consistent with canonicalDocs)
    val dropped = DedupOps.textDedupGroups(spark, sfDir).count() -
      DedupOps.canonicalDocs(spark, sfDir).count()
    assert(rates.map(_.getAs[Long]("n_dup_docs")).sum == dropped,
      "per-source drop counts must sum to the corpus-wide drop count")
    rates.foreach { r =>
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  test("curation funnel: every stage reachable, precedence holds") {
    // a synthetic corpus hitting EVERY funnel stage — the sf testdata
    // never exercises 2_contaminated (shadowed by dups) or 5_low_quality
    val bench = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 30).map(i => s"filler$i").mkString(" ")
    val deBruijn =
      "a, a, b, a, c, a, d, a, e, b, b, c, b, d, b, e, c, c, d, c, e, d, d, e, e,"
    val good = "the quick brown fox jumps over a lazy dog and then " +
      "walks off to find the next interesting thing in the field"
    val boilerDocs = (80L to 85L).map(i =>
      (i, "en", s"common filler phrase u${i}a u${i}b"))
    // chunk-dup pair: 64 shared head tokens (one aligned chunk) + 48 own
    // tokens each — chunk 0 identical, chunk 1 distinct, Jaccard ≈ 0.39
    // (far below the 0.85 doc-dup bar), quality and repetition clean
    // (stopwords interleaved, all bigrams distinct)
    val p = mkTok("pp", 64)
    val chunkDupA = (p ++ mkTok("qq", 48)).mkString(" ")
    val chunkDupB = (p ++ mkTok("rr", 48)).mkString(" ")
    // url-dup pair: both ids ≡ 0 (mod UrlNoIdMod) share a first token,
    // so their canonical URLs collide; 35 (min id) keeps and must clear
    // every later stage, 49 lands in stage 0 whatever its content
    val urlKeep = "slugword the quick brown fox jumps over a lazy dog " +
      "and then walks off to find the next interesting thing in a field"
    val urlDup = "slugword the slow green turtle crawls under a busy " +
      "bridge and then waits to see the first interesting boat of a day"
    // 8 words × 3 occurrences, every ordered bigram distinct (not
    // repetitive), commas kill the punctuation term → q10k = 2553 < the
    // 3000 floor, while the SHAPE rules all pass (24 tokens, avg word
    // length 4, 6 stopword hits)
    val lowQ = "wdc, wdf, wdd, wdb, and, wdd, the, and, wdc, wda, wdb, " +
      "the, wde, wdb, wda, and, wdf, wdc, wde, wda, wdd, wde, the, wdf,"
    val docs = (Seq(
      (1L, "en", bench),                   // benchmark side (id < 25)
      (30L, "en", s"$bench $filler"),      // quotes the benchmark verbatim
      (40L, "en", s"twin text $filler"),   // exact-dup pair: 41 drops
      (41L, "en", s"twin text $filler"),
      (35L, "en", urlKeep),                // url-group min id: admits
      (49L, "en", urlDup),                 // canonical-URL dup of 35
      (50L, "en", ("spam " * 20).trim),    // repetitive
      (60L, "en", deBruijn),               // 1-char words: rule-filtered
      (65L, "en", lowQ),                   // shape-pass but low quality
      (70L, "en", good),
      (90L, "en", chunkDupA),              // canonical chunk owner: admits
      (92L, "en", chunkDupB)) ++ boilerDocs) // half its chunks are 90's
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.curationFunnel(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    // 49 url-dup (canonical URL collides with 35, min id keeps);
    // 41 dropped (exact dup, quality tie -> min id keeps 40);
    // 30 contaminated-but-not-dup; 92 chunk-dup (shares chunk 0 with 90
    // but is NOT a doc-level dup); 50 repetitive (ALSO low quality:
    // q10k = 2800 — stage 4 must win); 80-85 boilerplate ("common
    // filler phrase" in 6 docs > bar 5); rule-filtered: 1 (6 words),
    // 40 (no stopwords), 60 (avg word length < 3) — each would have
    // been admitted/low-quality before the rule stage; 65 low quality
    // (shape rules pass, q10k = 2553); admitted: 35, 70, 90
    assert(got == Map(
      "0_url_dup" -> 1L,
      "1_dup_dropped" -> 1L, "2_contaminated" -> 1L, "3_chunk_dup" -> 1L,
      "4_repetitive" -> 1L, "5_boilerplate" -> 6L, "6_rule_filtered" -> 3L,
      "7_low_quality" -> 1L, "8_admitted" -> 3L),
      s"funnel stages: $got")
  }

  /** Distinct content words interleaved with cycling stopwords — clears
    * the quality floor and repetition bars at any length (top word
    * ≈ n/6 ≤ 20%, all bigrams distinct). */
  private def mkTok(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i =>
      if (i % 2 == 0) Seq("the", "of", "and")((i / 2) % 3)
      else s"$prefix${i / 2}")

  test("chunk containment catches sub-document contamination doc-level misses") {
    import spark.implicits._
    // LONG benchmark (640 tokens); corpus doc 100 copies its first 192
    // tokens verbatim (head-aligned → chunk grid aligns) then diverges
    val s640 = mkTok("ss", 640)
    // doc 102 repeats ITSELF with a stride-aligned 48-token period: its
    // 3 chunks are identical to each other but owned by no other doc —
    // intra-doc repetition is the repetitive stage's business, not a
    // chunk dup (cross-doc-only semantics)
    val periodic = Seq.fill(3)(mkTok("vv", 48)).flatten
    val docs = Seq(
      (5L, "en", s640.mkString(" ")),      // benchmark side (id < 25)
      (100L, "en", (s640.take(192) ++ mkTok("tt", 144)).mkString(" ")),
      (101L, "en", mkTok("uu", 200).mkString(" ")),
      (102L, "en", periodic.mkString(" ")))
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("chcont").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // doc-level containment is |shared|/|BENCHMARK| = ~190/638 < 0.8:
    // the partial quote of a long benchmark is invisible to it
    val docLevel = graft.operators.DedupOps.contamination(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!docLevel.contains(100L),
      s"doc-level containment must MISS the partial quote, got $docLevel")
    // chunk-level: 3 of doc 100's 7 chunks carry benchmark fps (43% ≥ 30%)
    val chunkLevel = CurationOps.chunkContamination(spark, dir).collect()
    val flagged = chunkLevel.map(_.getAs[Long]("doc_id")).toSet
    assert(flagged == Set(100L),
      s"chunk containment must flag exactly doc 100, got ${chunkLevel.toSeq}")
    val r100 = chunkLevel.find(_.getAs[Long]("doc_id") == 100L).get
    assert(r100.getAs[Long]("n_matched") == 3L
      && r100.getAs[Long]("n_chunks") == 7L)
    // and chunkDedup sees the cross-doc chunk copies without flagging
    // the doc (3 of 7 < half)
    val cd = CurationOps.chunkDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_chunks"), r.getAs[Boolean]("chunk_dup"))).toMap
    assert(cd(100L) == ((3L, false)), s"chunkDedup rows: ${cd.toSeq}")
    assert(cd(101L) == ((0L, false)))
    // self-repeating doc: identical chunks, zero CROSS-doc dups
    assert(cd(102L) == ((0L, false)),
      s"intra-doc repeats must not count as chunk dups: ${cd.toSeq}")
  }

  test("sq8 ANN: top-1 matches exact; sim error bounded by quantization") {
    import graft.operators.VectorOps
    val exact = VectorOps.knnBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rank"), r.getLong(2),
        r.getAs[Double]("sim")))
    val sq = VectorOps.annSq8(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rank"), r.getLong(2),
        r.getAs[Double]("sim")))
    // int8 noise can only flip ranks whose EXACT sims sit inside the
    // quantization error envelope (measured max 0.072 over all pairs
    // at sf0.01; 0.1 is the conservative bound). Whenever the exact
    // rank-1/rank-2 gap clears 2× the envelope, the true nearest
    // neighbor must survive; near-ties are legitimately unstable (this
    // synthetic data has 3e-4 gaps, so the clear-margin branch may not
    // fire here — the constructed-twin test below is the guaranteed
    // non-vacuous top-1 check).
    val Envelope = 0.1
    val exTop1 = exact.filter(_._2 == 1).map(t => t._1 -> (t._3, t._4)).toMap
    val exTop2 = exact.filter(_._2 == 2).map(t => t._1 -> t._4).toMap
    val sqTop1 = sq.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    exTop1.foreach { case (q, (n, s1)) =>
      if (exTop2.get(q).forall(s2 => s1 - s2 > 2 * Envelope))
        assert(sqTop1(q) == n,
          s"clear-margin top-1 must survive quantization: query $q")
    }
    // quantized cosine stays within the SQ8 error envelope of the
    // exact cosine on every pair both report
    val exSim = exact.map(t => (t._1, t._3) -> t._4).toMap
    sq.foreach { case (q, _, n, s) =>
      exSim.get((q, n)).foreach { e =>
        assert(math.abs(s - e) < Envelope,
          s"sim error too large: q=$q n=$n $s vs $e")
      }
    }
    // constructed clear-margin case: a corpus containing an EXACT TWIN
    // of each query (plus orthogonal-ish noise vectors) must rank the
    // twin first at sim 1.0 under SQ8 — the non-vacuous top-1 check
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val qs = (0L until 3L).map(i => (i, vec(), 0))
    val twins = qs.map { case (i, v, _) => (100L + i, v.clone(), 0) }
    val noise = (200L until 220L).map(i => (i, vec(), 0))
    val dir = java.nio.file.Files.createTempDirectory("sq8twin").toString
    (qs ++ twins ++ noise).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val twinTop1 = VectorOps.annSq8(spark, dir, k = 1, nQueries = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getAs[Double]("sim")))
      .toMap
    (0L until 3L).foreach { i =>
      assert(twinTop1(i) == (100L + i, 1.0),
        s"exact twin must win at sim 1.0: query $i got ${twinTop1(i)}")
    }
  }

  test("canonical docs: argmax member per dup group") {
    val groups = DedupOps.textDedupGroups(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val canon = DedupOps.canonicalDocs(spark, sfDir).collect()
    if (groups.nonEmpty) {
      val quality = TextOps.qualityScore(spark, sfDir)
        .select(col("doc_id"), col("quality")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val byRep = groups.groupBy(_._2)
      assert(canon.length == byRep.size, "one row per dup group")
      canon.foreach { r =>
        val members = byRep(r.getAs[Long]("rep_id")).map(_._1)
        val keep = r.getAs[Long]("keep_id")
        assert(members.contains(keep), "canonical pick must be a member")
        assert(r.getAs[Long]("n_members") == members.length)
        val best = members.map(quality).max
        assert(quality(keep) == best
          && r.getAs[Double]("keep_quality") == best)
        assert(members.filter(m => quality(m) == best).min == keep,
          "quality ties must break to the smallest doc_id")
      }
    } else assert(canon.isEmpty)
  }

  test("chunking: window boundaries, overlap, and tail behavior") {
    val rows = CurationOps.chunkDocs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val stats = TextOps.textStats(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
    byDoc.foreach { case (id, cs) =>
      val n = stats(id).toLong
      val sorted = cs.sortBy(_.getAs[Int]("chunk_id"))
      // chunk count = stride multiples below n, minus a tail chunk that
      // would be fully contained in its predecessor (no new content)
      val expect = (0L until n by CurationOps.ChunkStride.toLong)
        .count(s => s == 0 || s + CurationOps.ChunkOverlap < n)
      assert(sorted.length == expect, s"doc $id: ${sorted.length} vs $expect")
      // every kept non-first chunk contributes at least one new token
      sorted.drop(1).foreach { c =>
        val start = c.getAs[Int]("chunk_id").toLong * CurationOps.ChunkStride
        assert(start + CurationOps.ChunkOverlap < n,
          s"doc $id chunk ${c.getAs[Int]("chunk_id")} is contained in its predecessor")
      }
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Int]("chunk_id") == i)
        val start = i.toLong * CurationOps.ChunkStride
        assert(c.getAs[Int]("n_tok")
          == math.min(CurationOps.ChunkTokens.toLong, n - start),
          s"doc $id chunk $i length")
      }
      // consecutive FULL chunks overlap by exactly ChunkOverlap tokens:
      // start delta is the stride, windows are ChunkTokens wide
      assert(CurationOps.ChunkTokens - CurationOps.ChunkStride
        == CurationOps.ChunkOverlap)
    }
    // zero-token docs emit no chunks
    val docsWithChunks = byDoc.keySet
    stats.filter(_._2 == 0).foreach { case (id, _) =>
      assert(!docsWithChunks(id), s"empty doc $id must not chunk")
    }
  }

  test("mixture plan: shares, caps and epoch factors reconcile") {
    val plan = CurationOps.mixturePlan(spark, sfDir).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val avail = r.getAs[Long]("tokens_avail")
      val needed = r.getAs[Long]("tokens_needed")
      assert(needed ==
        r.getAs[Long]("share_10k") * CurationOps.MixTargetTokens / 10000,
        s"needed = share × budget: $r")
      assert(r.getAs[Long]("sample_rate_10k")
        == math.min(10000L, needed * 10000 / avail), s"rate formula: $r")
      assert(r.getAs[Long]("epochs_100") == needed * 100 / avail,
        s"epoch formula: $r")
    }
    // the declared budget exercises both regimes on the testdata:
    // at least one stratum oversamples (repeats data) and the planner
    // never asks for a rate above 1
    assert(plan.forall(_.getAs[Long]("sample_rate_10k") <= 10000L))
    assert(plan.exists(_.getAs[Long]("epochs_100") > 100L),
      s"an oversampled stratum should exist, got ${plan.toSeq}")
  }

  test("quality floor: measured split on planted garbage/clean fixtures") {
    import spark.implicits._
    // garbage classes the admission floor exists to screen: token spam,
    // thin repeats, punctuation soup, low-diversity junk
    val garbage = Seq(
      "spam spam spam spam spam spam spam spam",
      "x x x x x x x x x x",
      "!!!! !!!! !!!! !!!! !!!! !!!! !!!! !!!! !!!! !!!!",
      "a, a, b, a, c, a, d, a, e, b, b, c, b, d, b, e, c, c, d, c, e, d, d, e, e,"
    ).zipWithIndex.map { case (t, i) => (i.toLong, "garbage", t) }
    val clean = Seq(
      "the quick brown fox jumps over a lazy dog and then walks off to " +
        "find the next interesting thing in the field",
      "a short note about the weather today, with a hint of rain in the " +
        "late afternoon and a clear evening to follow.",
      "builders of large data systems tend to care about the shape of a " +
        "shuffle and the cost of a scan.",
      "in the morning the crew loaded the telescope data and checked " +
        "each file against the manifest of the night.",
      "the report covers ingestion, validation and registration of files " +
        "in the archive, with notes on each failure mode."
    ).zipWithIndex.map { case (t, i) => ((100 + i).toLong, "clean", t) }
    val labeled = (garbage ++ clean).toDF("doc_id", "label", "text")
    val cal = TextOps.qualityCalibration(labeled).collect()
    // the floor must sit in an EMPTY band: every garbage bin below it
    // (not admitted), every clean bin at or above it (admitted)
    cal.foreach { r =>
      val admitted = r.getAs[Boolean]("admitted")
      if (r.getAs[Long]("n_garbage") > 0)
        assert(!admitted, s"garbage bin admitted: $r")
      if (r.getAs[Long]("n_clean") > 0)
        assert(admitted, s"clean bin rejected: $r")
    }
    // pin the measured split the QualityFloor10k scaladoc records:
    // garbage tops out well under the floor, clean prose well over
    val maxGarbage = cal.filter(_.getAs[Long]("n_garbage") > 0)
      .map(_.getAs[Long]("max_q10k")).max
    val minClean = cal.filter(_.getAs[Long]("n_clean") > 0)
      .map(_.getAs[Long]("min_q10k")).min
    assert(maxGarbage < TextOps.QualityFloor10k,
      s"garbage must stay under the floor, max=$maxGarbage")
    assert(minClean >= 5000,
      s"clean prose must clear the floor with margin, min=$minClean")
  }

  test("13-gram decontamination catches a mid-document quote both others miss") {
    // a single verbatim 16-token benchmark quote spliced mid-document:
    // too small for doc-level containment (16/640 of the benchmark),
    // not chunk-aligned (no WHOLE 64-token window matches a benchmark
    // chunk) — only the exact n-gram detector fires, with exactly
    // 16 - 13 + 1 = 4 distinct shared grams
    val bench = mkTok("bb", 640)
    val quote = bench.slice(300, 316)
    val docs = Seq(
      (5L, "en", bench.mkString(" ")), // benchmark side (id < 25)
      (100L, "en", (mkTok("cc", 80) ++ quote ++ mkTok("dd", 80))
        .mkString(" ")),
      (101L, "en", mkTok("ee", 150).mkString(" ")))
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("ngcont").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docLevel = DedupOps.contamination(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!docLevel.contains(100L),
      s"doc-level containment must MISS the short quote, got $docLevel")
    val chunkLevel = CurationOps.chunkContamination(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(chunkLevel.isEmpty,
      s"chunk containment must MISS the unaligned quote, got $chunkLevel")
    val ng = DedupOps.ngramContamination(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    assert(ng == Map(100L -> 4L),
      s"n-gram detector must flag doc 100 with 4 shared grams, got $ng")
  }

  test("bpe merges: loop equals an independent symbol-list fold") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    val docs = Seq(
      (1L, "en", "lower lowest newer newest lower lower"),
      (2L, "en", "low lower newest newer new lowest"),
      (3L, "en", "wider wide widest low low newer")
    ).toDF("doc_id", "lang", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent reference: greedy BPE over SYMBOL LISTS (no string
    // encoding — a shared encoding bug could not hide here)
    def applyMerge(sym: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < sym.length) {
        if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += sym(i); i += 1 }
      }
      out.result()
    }
    var words: Seq[(Vector[String], Long)] = docs.collect()
      .flatMap(_.getString(2).split(" ").filter(_.nonEmpty)).toSeq
      .groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toVector, g.size.toLong) }.toSeq
    val expected = (1 to TextOps.BpeMergeIters).map { rank =>
      val counts = words
        .flatMap { case (s, c) => s.zip(s.tail).map(p => (p, c)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val ((a, b), n) = counts
        .sortBy { case ((x, y), c) => (-c, x + " " + y) }.head
      words = words.map { case (s, c) => (applyMerge(s, a, b), c) }
      (rank.toLong, a + " " + b, n)
    }
    val got = TextOps.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the loop must get past single characters: later merges compound
    // earlier ones (a pair with a multi-char side)
    assert(expected.exists { case (_, p, _) =>
      p.split(" ").exists(_.length > 1) },
      s"fixture never reached a compound merge: $expected")
    // rank 1 is exactly bpePairs' top row (same statistic, iteration 1)
    val top = TextOps.bpePairs(spark, dir).limit(1).collect()(0)
    assert((1L, top.getString(0), top.getLong(1)) === got.head)
    // the segmented vocabulary is the reference fold's final state
    val segExpected = words
      .map { case (s, c) => (s.mkString(""), c, s.mkString(" "), s.length) }
      .toSet
    val seg = TextOps.bpeSegmented(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSet
    assert(seg === segExpected)
    // and the symbol vocab reconciles with the segmentation
    val symExpected = words
      .flatMap { case (s, c) => s.map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (sym, n) => (-n, sym) }
      .take(TextOps.BpeSymbolTopK).toSet
    val sym = TextOps.bpeSymbolVocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sym === symExpected)
    // per-doc token accounting under the trained tokenizer: each doc's
    // count is the sum of its tokens' segment lengths
    val segLen = words.map { case (s, _) => s.mkString("") -> s.length }.toMap
    val tcExpected = docs.collect().map { r =>
      r.getLong(0) -> r.getString(2).split(" ").filter(_.nonEmpty)
        .map(t => segLen(t).toLong).sum
    }.toMap
    val tc = TextOps.bpeTokenCount(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tc === tcExpected)
  }

  test("curationRun: composed outputs equal the declared queries") {
    val outDir = java.nio.file.Files.createTempDirectory("crun").toString
    val run = CurationOps.curationRun(spark, sfDir, outDir)
    def rows(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSeq
        .sortBy(_.mkString("|"))
    }
    // each materialized output must equal its declared (self-contained)
    // query — the run only changes WHERE the chain is paid, never results
    assert(rows(run("groups"))
      == rows(DedupOps.textDedupGroups(spark, sfDir)))
    assert(rows(run("canonical"))
      == rows(DedupOps.canonicalDocs(spark, sfDir)))
    assert(rows(run("dup_rates"))
      == rows(DedupOps.dupRateBySource(spark, sfDir)))
    assert(rows(run("funnel"))
      == rows(CurationOps.curationFunnel(spark, sfDir)))
    assert(rows(run("chunks"))
      == rows(CurationOps.chunkDocs(spark, sfDir)))
    // the admitted corpus is the stage-8 slice of the same staged pass,
    // and reconciles exactly with the funnel's admitted counts
    val stageRows = run("stages").collect()
    assert(stageRows.map(_.getAs[Long]("doc_id")).toSet.size == stageRows.length)
    val admitted = run("admitted").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(admitted == stageRows
      .filter(_.getAs[String]("stage") == "8_admitted")
      .map(_.getAs[Long]("doc_id")).toSet)
    val funnelAdmitted = run("funnel").collect()
      .filter(_.getAs[String]("stage") == "8_admitted")
      .map(_.getAs[Long]("n_docs")).sum
    assert(admitted.size.toLong == funnelAdmitted,
      "admitted table must reconcile with the funnel report")
    // the stored NB model scores the corpus identically to the
    // self-contained declared query (train-once, derive-everywhere)
    val viaStored = TextOps.nbScoreFrom(
      graft.sources.Tables.documents(spark, sfDir),
      run("nb_weights"), run("nb_prior")).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("nb_score"))).toSet
    val viaDeclared = TextOps.nbQuality(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("nb_score"))).toSet
    assert(viaStored == viaDeclared,
      "stored-model scoring must equal the self-contained query")
    // and the returned frames scan the MATERIALIZED tables (leaf scan
    // paths under outDir) — a chain recompute would also end in parquet
    // Relations, but of the SOURCE corpus, so pin the actual file paths
    run.foreach { case (name, df) =>
      val paths = df.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq("<non-file relation>")
          }
        case other => Seq(s"<non-scan leaf: ${other.nodeName}>")
      }
      assert(paths.nonEmpty && paths.forall(_.contains(outDir)),
        s"$name read-back must scan $outDir, got $paths")
    }
  }

  test("canonicalizeUrl: every normalization axis") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def canon(u: String): String =
      Seq(u).toDF("u").select(CurationOps.canonicalizeUrl(col("u")))
        .head().getString(0)
    // scheme/host case, www, default port, tracking params, fragment
    assert(canon("HTTP://WWW.Example.COM:80/Page?utm_source=f&id=3#top")
      == "http://example.com/Page?id=3")
    assert(canon("https://Example.com:443/a") == "https://example.com/a")
    // non-default port KEPT
    assert(canon("http://example.com:8080/a") == "http://example.com:8080/a")
    // path case preserved; trailing slash dropped except root
    assert(canon("http://example.com/CaseSig/") ==
      "http://example.com/CaseSig")
    assert(canon("http://example.com/") == "http://example.com/")
    assert(canon("http://example.com") == "http://example.com/")
    // tracking-only query vanishes entirely; others keep their order
    assert(canon("http://a.io/p?utm_a=1&utm_b=2&fbclid=x&gclid=y&ref=z")
      == "http://a.io/p")
    assert(canon("http://a.io/p?b=2&utm_x=1&a=1") == "http://a.io/p?b=2&a=1")
    // a param NAMED like a tracking prefix but not matching stays
    assert(canon("http://a.io/p?utmost=1&reference=2")
      == "http://a.io/p?utmost=1&reference=2")
    // fragment-only and empty-query edge cases
    assert(canon("http://a.io/p#frag") == "http://a.io/p")
    assert(canon("http://a.io/p?") == "http://a.io/p")
  }

  test("urlDedup reconciles with urlDupDrops and the corpus") {
    val census = CurationOps.urlDedup(spark, sfDir).collect()
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(census.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "census partitions the corpus")
    val expectedDrops = census.map(_.getAs[Long]("n_docs") - 1).sum
    val drops = CurationOps.urlDupDrops(spark, sfDir).count()
    assert(drops == expectedDrops,
      "drops = everything but one keeper per canonical group")
    assert(drops > 0, "the planted no-id subset must produce real dups")
  }
}
