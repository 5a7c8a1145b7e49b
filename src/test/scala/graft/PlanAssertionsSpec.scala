package graft

/** Physical-plan regression guards: the properties PLANS.md documents,
  * pinned as assertions so a refactor cannot silently lose them —
  * pushed parquet filters, whole-stage codegen on the hot aggregates,
  * broadcast on the small side (and NEVER on the unbounded side). */
class PlanAssertionsSpec extends SparkSpec {

  /** True iff every shuffle Exchange in `p` is the explicit fan-out
    * repartition (`REPARTITION_BY_NUM`) that ScaleUtils.fanOutScan
    * inserts on single-row-group scans — identity at any real scale, so
    * a guard that tolerates ONLY it still forbids every
    * computation-required shuffle (ENSURE_REQUIREMENTS exchanges). */
  private def onlyFanOutExchanges(p: String): Boolean = {
    val ex = p.linesIterator.filter(_.contains("Exchange ")).toSeq
    // bounded, not just typed (ADVICE r18): a fanOutScan applied twice
    // along one path would still read as all-REPARTITION_BY_NUM —
    // cap the count so an accidental double/nested repartition of a
    // map-only plan fails here instead of silently double-shuffling
    ex.forall(_.contains("REPARTITION_BY_NUM")) && ex.size <= 2
  }

  private def plan(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
    // materialize THIS QueryExecution (an action on the DataFrame would
    // clone the plan): under AQE the pre-execution plan is not final —
    // no codegen spans yet
    qe.toRdd.count()
    qe.executedPlan.toString
  }

  test("q_pushdown: predicates reach the parquet scan") {
    val p = plan("q_pushdown")
    assert(p.contains("PushedFilters: ["),
      s"expected pushed filters:\n$p")
    assert(!p.contains("PushedFilters: []"),
      s"pushed-filter list must be non-empty:\n$p")
  }

  test("q1_pricing: scan-side filter pushed and aggregate codegen'd") {
    val p = plan("q1_pricing")
    // codegen'd operators carry the `*(n)` star in tree strings
    assert(p.contains("*(1)"), s"expected whole-stage-codegen spans:\n$p")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"date filter must reach parquet:\n$p")
  }

  test("q_knn_cosine: the query side broadcasts, the corpus does not") {
    val p = plan("q_knn_cosine")
    assert(p.contains("BroadcastExchange"),
      s"small query side should broadcast:\n$p")
  }

  test("top-k tails: no per-query window funnel over corpus-scale rows") {
    // query_id has ~5 values — a rank window partitioned on it alone
    // funnels every scored corpus row of a query through one task. The
    // search TAILS window on (query_id, pid) with a rank filter, which
    // plans a PARTIAL WindowGroupLimit below the exchange (≤ k rows per
    // query leave each input partition). Single-key windows that remain
    // operate on metadata-scale inputs only: the IVF probe ranks
    // queries × cells rows, and the k-means assignment partitions by
    // vec_id (full cardinality — parallel by construction).
    def oneKeyWindows(q: String): Int = windowKeyCounts(q).count(_ == 1)
    assert(oneKeyWindows("q_knn_cosine") == 0,
      "knn: the only window is the two-phase (query_id, pid) local rank")
    assert(oneKeyWindows("q_ann_ivf") == 1,
      "ivf: probe rank (cells-scale) is the only single-key window")
    assert(oneKeyWindows("q_ann_ivf_kmeans") == 2,
      "trained ivf: probe rank + per-vec_id assignment only")
    assert(oneKeyWindows("q_ann_sq8") == 0,
      "sq8: the only window is the two-phase (query_id, pid) local rank")
    for (q <- Seq("q_knn_cosine", "q_ann_ivf", "q_ann_ivf_kmeans",
        "q_ann_sq8")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
        s"$q: search tail must push a partial group limit:\n$p")
    }
  }

  test("q_ann_pq: codebooks and ADC table broadcast; no cartesian; partial limit") {
    val p = plan("q_ann_pq")
    // training assignment, probe, and the ADC-table join must all take
    // the tiny side as a broadcast; the corpus never cross-joins
    assert(p.contains("BroadcastExchange"),
      s"codebooks/ADC table should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian product anywhere in the PQ plan:\n$p")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"the shared top-k tail must push a partial group limit:\n$p")
    // the per-(query, neighbor) score sum partially aggregates before
    // its exchange (map-side combine on the codes join output)
    assert(p.contains("partial_sum"),
      s"ADC score sum must combine map-side:\n$p")
  }

  test("q_keyword_contract: map-only — no computation shuffle") {
    val p = plan("q_keyword_contract")
    assert(onlyFanOutExchanges(p) && !p.contains("Join"),
      s"row-local validation must not shuffle (fan-out repartition ok):\n$p")
  }

  /** Logical Windows in a query's optimized plan, as partition-key counts. */
  private def windowKeyCounts(name: String): Seq[Int] =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan
      .collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.partitionSpec.size
      }

  test("graph family: no partition-less window over the registry") {
    // ranksFrom used to plan dense_rank over Window.orderBy(source) —
    // ONE task sorting the whole domain registry (VERDICT r15 item 1).
    // The two-phase rewrite buckets on the order-consistent name
    // prefix; every Window in all five graph plans (and the streaming
    // authority path that shares ranksFrom) must carry a partition key.
    for (q <- Seq("q_link_graph", "q_pagerank", "q_pagerank_seeded",
        "q_link_reciprocity", "q_authority_quota")) {
      val zero = windowKeyCounts(q).count(_ == 0)
      assert(zero == 0,
        s"$q plans $zero partition-less Window(s) — registry sort funnel")
    }
  }

  test("q_docids_per_lang: no per-lang window funnel (two-phase top-k)") {
    // lang has ~5 values: a Window partitioned by lang alone routes every
    // doc of a language through ONE task (VERDICT r3/r4 item 1). The
    // two-phase rewrite windows on (lang, pid) — full parallelism — and
    // its rank filter must plan a PARTIAL WindowGroupLimit below the
    // exchange, capping shuffle VOLUME at cap rows per lang per input
    // partition.
    assert(windowKeyCounts("q_docids_per_lang").forall(_ >= 2),
      "no window may partition on lang alone")
    val p = plan("q_docids_per_lang")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"rank filter must push a partial group limit below the exchange:\n$p")
  }

  test("q_media_meta: column pruning reaches the scan") {
    val p = plan("q_media_meta")
    // only doc_id and text are needed; lang/source/n_chars must be pruned
    assert(p.contains("ReadSchema") && !p.contains("n_chars"),
      s"unused columns must be pruned from the scan:\n$p")
  }

  test("q_audio_features: decode kernel keys ride along — no join, one exchange") {
    // lang travels through the mapPartitions kernel in declared_meta, so
    // the plan must be scan -> kernel -> partial agg -> ONE exchange ->
    // final agg: no join back to documents, no second scan
    val p = plan("q_audio_features")
    assert(!p.contains("Join"), s"no join back to the documents table:\n$p")
    // plan text names each node once per section (final + initial)
    assert(p.linesIterator.count(l =>
        l.contains("Exchange ") && !l.contains("REPARTITION_BY_NUM")) <= 2,
      s"only the aggregate exchange (fan-out repartition ok):\n$p")
  }

  test("q_bm25_topk: 1-row stats broadcast, top-k tail, no window") {
    val p = plan("q_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must plan per-partition take + driver merge:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row corpus stats must broadcast onto the scoring scan:\n$p")
    assert(!p.contains("Window"),
      s"per-doc tf is an array filter — no window over the corpus:\n$p")
  }

  test("q_rrf_fusion: both arms end in top-k before ranks are numbered") {
    // the rank windows and the fusion join must run over <= 2*RrfDepth
    // rows — every TakeOrderedAndProject sits below them
    val p = plan("q_rrf_fusion")
    assert(p.contains("TakeOrderedAndProject"),
      s"each arm must bound itself with a top-k:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the probe side must broadcast:\n$p")
  }

  test("q_nb_top_tokens: top-k via TakeOrderedAndProject, no global sort") {
    val p = plan("q_nb_top_tokens")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit after orderBy must plan a top-k, not a full sort:\n$p")
    assert(!p.contains("GlobalSort"), s"no global vocabulary sort:\n$p")
  }

  test("q_video_meta: map-only box-walk kernel — no computation shuffle") {
    val p = plan("q_video_meta")
    assert(onlyFanOutExchanges(p) && !p.contains("Join"),
      s"row-per-media metadata parse must stay map-only:\n$p")
  }

  test("q_robots_filter: verdicts ride the doc scan — broadcast join, " +
      "no doc-side shuffle") {
    val p = plan("q_robots_filter")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"),
      s"the per-host rule arrays must broadcast onto the doc scan:\n$p")
    // the ONE allowed exchange (plan text names it twice: final +
    // initial) is the ≤|domains| DISTINCT that derives the robots
    // registry — the document side itself must not shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"robots verdicts must not shuffle the document side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a registry-sized dimension must never sort-merge:\n$p")
  }

  test("q_etld1: PSL lookup is broadcast joins over the doc scan — " +
      "no shuffle") {
    val p = plan("q_etld1")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"),
      s"the suffix rule dim must broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the eTLD+1 derivation must not shuffle the document side:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim joins must hash:\n$p")
  }

  test("q_source_cap: partial group limit truncates before the exchange") {
    // the per-source cap must shuffle O(sources·cap) rows, not the
    // corpus: the rank filter plans a PARTIAL WindowGroupLimit below
    // the exchange, and the scan reads only (doc_id, source)
    val p = plan("q_source_cap")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"cap must truncate map-side:\n$p")
    assert(!p.contains("text"), s"text must be pruned from the scan:\n$p")
  }

  test("winnow family: no gram-hash HOF chain in a filter or scan") {
    // the r9 defect: the join-key null filter, pushed below the deriving
    // projections, inlined the whole gram-hash chain into the
    // per-window-position lambda — re-evaluated per row on BOTH
    // self-join branches. The materialized fingerprint relation must
    // keep every Filter condition and scan DataFilters HOF-free;
    // deriving Projects may (and do) contain lambdas.
    // q_shared_spans inherits the same discipline: its positional-gram
    // relation checkpoints before the posexplode, so both join branches
    // must read the stored array with HOF-free filters
    for (q <- Seq("q_winnow_fp", "q_winnow_overlap",
        "q_shared_spans", "q_shared_spans_cand")) {
      val bad = plan(q).linesIterator
        .filter(l => l.contains("Filter ") || l.contains("FileScan"))
        .filter(l => l.contains("lambdafunction") || l.contains("transform("))
        .toSeq
      assert(bad.isEmpty,
        s"$q: HOF chain inlined into a filter/scan:\n${bad.mkString("\n")}")
    }
  }

  test("q_dsir_weights and q_lm_score: the ratio/vocab side broadcasts") {
    // scoring joins are explode ⋈ small-relation — the 256-bucket
    // ratio table / vocab must be the broadcast side, never the corpus
    assert(plan("q_dsir_weights").contains("BroadcastExchange"),
      "bucket-ratio table should broadcast")
    assert(plan("q_lm_score").contains("BroadcastExchange"),
      "the 1-row total must broadcast")
  }

  test("q_pii_scan: pure projection — no computation shuffle") {
    val p = plan("q_pii_scan")
    assert(onlyFanOutExchanges(p),
      s"PII scan must stay map-only (codegen'd regex projection):\n$p")
  }

  test("q_repeat_scrub and q_chunk_semdedup: no cartesian product") {
    // the scrub's coverage join and the chunk dedup's within-cluster
    // pair join are both EQUI-joins — a refactor that loses the key
    // (doc,pos)/(cluster) would fall back to a corpus-wide cross
    for (q <- Seq("q_repeat_scrub", "q_chunk_semdedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: equi-join degraded to a cartesian product:\n$p")
    }
  }

  test("samplers: plan/totals broadcast, corpus never the build side") {
    // the realizer joins the corpus against a LANGS-sized plan; the
    // resampler against a 1-row total + the 256-bucket ratio — both
    // must broadcast the small side (a corpus-side build at 100 TB is
    // the failure this pins against), and neither may cross-join wide
    for (q <- Seq("q_mixture_realized", "q_dsir_sample")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"),
        s"$q: the plan/ratio side must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q: no cartesian product:\n$p")
    }
  }

  test("q_group_purity: members-only shingle derivation (semi-join)") {
    // the audit must NOT explode the whole corpus: the left-semi
    // restriction on the group table has to survive refactors
    val p = plan("q_group_purity")
    assert(p.contains("LeftSemi"),
      s"shingle derivation must be restricted to dup-component docs:\n$p")
  }

  test("as-of family: single key shuffle, never a range join") {
    // the union-window rewrite is the WHOLE point of the operator: the
    // naive formulation plans a BroadcastNestedLoopJoin (quadratic per
    // key at 100 TB). Exactly one hashpartitioning(user_id) exchange
    // feeds the window; no join operator of any kind appears.
    for (q <- Seq("q_asof_join", "q_asof_tolerance", "q_asof_forward")) {
      val p = plan(q)
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        s"$q: as-of must never plan a range join:\n$p")
      assert(!p.contains("Join"), s"$q: no join operator at all:\n$p")
      // AQE tree strings render the plan twice (Final + Initial) — one
      // real exchange appears at most twice in the text
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
        s"$q: exactly one key shuffle:\n$p")
      assert(p.contains("Window"), s"$q: the running-last window:\n$p")
    }
  }

  test("q_asof_salted: bucketed windows, carry join equi — no range join") {
    // the salt's value: windows partition on (user, time-bucket), the
    // carry merge is a co-partitioned EQUI join on that same key —
    // never a nested-loop/range join, never a cartesian
    val p = plan("q_asof_salted")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"salted as-of must never plan a range join:\n$p")
    assert(p.contains("Window"), s"local + carry windows expected:\n$p")
    assert(p.contains("__bkt"), s"the bucket key must reach the plan:\n$p")
  }

  test("q_sessionize_salted: bucketed local pass, equi carry merge — " +
      "no range join, no cartesian") {
    // the decomposition's point: every window partitions on
    // (user_id, bkt) or on user_id over BUCKET-sized summaries, and
    // the merge is a co-partitioned equi join on (user_id, bkt)
    val p = plan("q_sessionize_salted")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"salted sessionize must never plan a range join:\n$p")
    assert(p.contains("Window"), s"local + carry windows expected:\n$p")
    assert(p.contains("bkt"), s"the bucket key must reach the plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
        || p.contains("BroadcastHashJoin"),
      s"the carry merge must be an equi-join:\n$p")
  }

  test("q_image_dhash_neardup: band equi-join is the only pair producer, " +
      "df-capped, decoding once") {
    val p = plan("q_image_dhash_neardup")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"banded matching must never go all-pairs:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
        || p.contains("BroadcastHashJoin"),
      s"the band candidate join must be an equi-join:\n$p")
    // the occupancy cap (VERDICT r14): the band-value df census and
    // its filter must reach the plan (the cap bound itself is a
    // driver-side literal, constant-folded)
    assert(p.contains("df#"),
      s"the band-value df cap must gate candidate generation:\n$p")
    // single decode (VERDICT r14): the signature relation is eagerly
    // checkpointed, so the executed plan reads materialized blocks —
    // the MapPartitions decode kernel must NOT appear (it ran once,
    // out of plan), let alone once per self-join side as before
    assert(p.contains("ExistingRDD"),
      s"expected the checkpointed signature scan:\n$p")
    assert(!p.contains("MapPartitions"),
      s"decode kernel must not re-run inside the join plan:\n$p")
  }

  test("perceptual neardup siblings: df cap + single decode in plan") {
    for (q <- Seq("q_audio_fp_neardup", "q_video_dhash_neardup",
        "q_image_whash_neardup")) {
      val p = plan(q)
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        s"$q must never go all-pairs:\n$p")
      assert(p.contains("df#"),
        s"$q: the band-value df cap must gate candidate generation:\n$p")
      assert(p.contains("ExistingRDD") && !p.contains("MapPartitions"),
        s"$q: decode must run once, before the checkpoint boundary:\n$p")
    }
  }

  test("q_sketch_overlap: mergeable partial sketch agg, broadcast pairs") {
    val p = plan("q_sketch_overlap")
    // the scale property: hll_sketch_agg plans with a PARTIAL phase
    // (map-side combine), so the shuffle carries per-source sketch
    // buffers, never the (source, shingle) relation
    assert(p.contains("partial_hll_sketch_agg") ||
        p.contains("hll_sketch_agg"),
      s"the mergeable sketch aggregate must reach the plan:\n$p")
    assert(p.contains("Broadcast"),
      s"the pair matrix over the tiny sketch table must broadcast:\n$p")
  }

  test("q_fixed_k_sample: sub-bucket phase-1 window reaches the plan") {
    // the skew escape: the FIRST window partitions on (lang, bkt), so a
    // hot stratum spreads across bucket sorts; the second window sees
    // only the bounded survivor set
    val p = plan("q_fixed_k_sample")
    assert(p.contains("bkt"), s"the sub-bucket key must reach the plan:\n$p")
    assert("Window".r.findAllIn(p).size >= 2,
      s"two window phases expected:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_quality_percentile: histogram ranks broadcast onto the scan") {
    // the calibration must never range-sort the corpus per language:
    // the window runs over the bounded histogram and the rank relation
    // comes back as a broadcast
    val p = plan("q_quality_percentile")
    assert(p.contains("BroadcastHashJoin"),
      s"the rank relation must broadcast onto the scan:\n$p")
    assert(p.contains("Window"), s"the histogram window must exist:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_top_paths: TakeOrderedAndProject tail, no global sort") {
    val p = plan("q_top_paths")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k tail must be per-partition heads:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_rate_anomaly: exploded baseline, no range join") {
    val p = plan("q_rate_anomaly")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"the trailing baseline must never plan a day-range join:\n$p")
  }

  test("q_sliding_wau: exploded window ends, no range join") {
    // the decomposition's point: a daily sketch reaches its <=7 window
    // ends through an EXPLODE + equi-shuffle on win_end — the trailing
    // window must never plan as a day-range join
    val p = plan("q_sliding_wau")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"trailing window must never plan a range join:\n$p")
    assert(p.contains("hll_union_agg") || p.contains("hll_sketch_agg"),
      s"the mergeable sketch chain must reach the plan:\n$p")
  }

  test("q_audio_fp_neardup: the shared banded matcher stays equi-join") {
    val p = plan("q_audio_fp_neardup")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"banded matching must never go all-pairs:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
        || p.contains("BroadcastHashJoin"),
      s"the band candidate join must be an equi-join:\n$p")
  }

  test("q_event_funnel_n: user-keyed aggregates, no window, no self-join blowup") {
    val p = plan("q_event_funnel_n")
    assert(!p.contains("Window"),
      s"the funnel fold is aggregates, never a window funnel:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"stage joins are user-keyed equi-joins:\n$p")
  }

  test("q_sessionize: the session aggregate reuses the window's shuffle") {
    // grouping key (user_id, session_n) has the window's partition key
    // as a prefix, so hashpartitioning(user_id) satisfies the aggregate
    // distribution — the whole query is ONE exchange
    val p = plan("q_sessionize")
    // AQE renders Final + Initial plans: one real exchange ≤ 2 mentions
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"one shuffle for window AND aggregate:\n$p")
  }

  test("q_bloom_dedup: bloom gate prunes before the verify join shuffles") {
    // the candidate filter must sit below the semi-join (that is the
    // gate's value: only ~fpp of novel rows reach the shuffle), and the
    // verify join must be an equi semi-join, never nested-loop
    val p = plan("q_bloom_dedup")
    assert(p.contains("LeftSemi"), s"exact verify is a semi-join:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"membership must stay an equi-join:\n$p")
    // the probe is the NATIVE expression now (r15 — the stat.bloomFilter
    // closure UDF is retired), still sitting below the semi-join
    assert(!p.contains("UDF"), s"no UDF may remain in the bloom gate:\n$p")
    val iFilter = p.indexOf("bloom_might_contain")
    val iJoin = p.indexOf("LeftSemi")
    assert(iFilter >= 0 && iJoin >= 0 && iFilter > iJoin,
      s"bloom probe must run below (after in tree order) the join:\n$p")
  }

  test("mg sketch queries: partial sketches below the shuffle, no window") {
    // the TypedImperativeAggregate must plan as ObjectHashAggregate
    // with a partial_mg_topk BELOW the exchange — each partition ships
    // <= k counters, never its token stream
    for (q <- Seq("q_heavy_hitters", "q_sketch_bounds")) {
      val p = plan(q)
      assert(p.contains("partial_mg_topk"),
        s"$q: map-side partial sketch missing:\n$p")
      assert(p.contains("ObjectHashAggregate"),
        s"$q: sketch must use the object hash aggregate:\n$p")
      assert(!p.contains("Window"), s"$q: no window anywhere:\n$p")
      // the 1-row totals cross is broadcast-NLJ by design; a true
      // cartesian is still banned
      assert(!p.contains("CartesianProduct"),
        s"$q: contract joins are equi/broadcast:\n$p")
    }
  }

  test("q_countmin: partial sketch below the exchange, constant output") {
    for (q <- Seq("q_countmin", "q_countmin_est", "q_cm_joinsize")) {
      val p = plan(q)
      assert(p.contains("partial_countmin"),
        s"$q: map-side partial CM buffer missing:\n$p")
      assert(!p.contains("Window") && !p.contains("CartesianProduct"),
        s"$q: one pass + tiny probes only:\n$p")
    }
    // the est probes join against a BROADCAST 1-row sketch
    assert(plan("q_countmin_est").contains("BroadcastExchange"),
      "est: the 1-row sketch must broadcast onto the probes")
  }

  test("q_kn_heldout: vocab-sized joins, 1-row types broadcast, no window") {
    val p = plan("q_kn_heldout")
    assert(p.contains("BroadcastExchange"),
      s"the 1-row N_types must broadcast:\n$p")
    assert(!p.contains("Window"),
      s"KN scoring is joins + hash aggs, never a window:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian anywhere (the 1-row cross is broadcast-NLJ):\n$p")
  }

  test("q_unicode_norm: map-only codegen'd normalization — no exchange") {
    val p = plan("q_unicode_norm")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"per-doc normalization must stay a pure projection:\n$p")
    assert(p.contains("graft_nfc") && p.contains("*(1)"),
      s"normalize expressions must ride inside whole-stage codegen:\n$p")
  }

  test("q_keyword_hits: map-only automaton scan — no exchange") {
    val p = plan("q_keyword_hits")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"the broadcast-automaton scan is embarrassingly parallel:\n$p")
  }

  test("q_keyword_tag: doc_id rollups, no window, no cartesian") {
    val p = plan("q_keyword_tag")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      s"rollup + join-back must not multiply shuffles:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"the dominant term is an aggregate (min_by), never a window:\n$p")
  }

  test("q3_shipping: TakeOrderedAndProject tail, no global sort") {
    val p = plan("q3_shipping")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must plan as TakeOrderedAndProject:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort for a bounded top-k:\n$p")
  }

  test("q_session_window: a session AGGREGATE, not a per-user sort window") {
    val p = plan("q_session_window")
    assert(!p.contains("Window"),
      s"native session_window plans as an aggregate, never a window fn:\n$p")
    assert(p.contains("session_window") || p.contains("SessionWindow") ||
      p.contains("MergingSessions") || p.contains("HashAggregate"),
      s"expected the session aggregate chain:\n$p")
  }

  test("q_json_parse: map-only Jackson parse — no exchange, no join") {
    val p = plan("q_json_parse")
    assert(onlyFanOutExchanges(p) && !p.contains("Join"),
      s"schema-declared parse is embarrassingly parallel:\n$p")
    assert(p.contains("from_json"), s"the parse must be in-plan:\n$p")
  }

  test("q_chat_render: fixture + render in one map-only projection") {
    val p = plan("q_chat_render")
    assert(onlyFanOutExchanges(p) && !p.contains("Join"),
      s"render is a pure projection over the scan:\n$p")
  }

  test("q_fuzzy_pairs: levenshtein verifies on candidates, never all-pairs") {
    val p = plan("q_fuzzy_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the deletion-key equi-join must drive candidates:\n$p")
    assert(p.contains("levenshtein"), s"verify must be in-plan:\n$p")
  }

  test("q_merge_upsert: one full-outer key join carries the merge") {
    val p = plan("q_merge_upsert")
    assert(p.contains("FullOuter"), s"merge is a full-outer join:\n$p")
    assert(!p.contains("CartesianProduct"), s"keyed, never cartesian:\n$p")
  }

  test("warc family: extract is map-only; digest dedup pays ONE exchange") {
    val pe = plan("q_warc_extract")
    assert(onlyFanOutExchanges(pe) && !pe.contains("Join"),
      s"warc extract is kernel-chain map-only:\n$pe")
    val pd = plan("q_warc_digest_dedup")
    assert(pd.contains("partial_count") || pd.contains("partial"),
      s"digest dedup must combine map-side:\n$pd")
    assert(!pd.contains("Join") && !pd.contains("CartesianProduct"),
      s"digest dedup is one groupBy, never a join:\n$pd")
    // the r18 additions keep the decode-kernel shape: pure map chains
    for (q <- Seq("q_warc_digest_verify", "q_warc_charset")) {
      val p = plan(q)
      assert(onlyFanOutExchanges(p) && !p.contains("Join"),
        s"$q is kernel-chain map-only:\n$p")
    }
  }

  test("content link graph: parsed edges keep the synthetic family's " +
      "shape — broadcast registry joins, no cartesian") {
    for (q <- Seq("q_link_graph_content", "q_pagerank_content",
        "q_anchor_text")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must never go cartesian:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q resolves hosts against the broadcast registry:\n$p")
    }
    // the edge-derivation queries (no rank iteration) never need a
    // shuffle join at all — every join is a node-sized broadcast
    for (q <- Seq("q_link_graph_content", "q_anchor_text")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"),
        s"$q's registry joins are node-sized broadcasts:\n$p")
    }
  }

  test("skew auto cutover: natural data plans PLAIN, hot fixture SALTED") {
    // The salted decompositions window on (user_id, bkt)/(key, __bkt);
    // the plain forms never materialize a bucket column — its presence
    // in the executed plan IS the branch taken. Natural events sit at
    // skew_x100 ~130 → plain. The hot fixture needs sf0.01: relative
    // skew is bounded by the key count, and sf0.001's 15 users cannot
    // manufacture an 8×-average hot key (the census correctly refuses
    // to salt it) — at the sf0.01 gate scale the even-fold reaches
    // ~3756 and trips.
    assert(!plan("q_sessionize_auto").contains("bkt"),
      "unskewed sessionize must take the single-window plain branch")
    assert(!plan("q_asof_auto").contains("__bkt"),
      "unskewed as-of must take the single-window plain branch")
    def planAt(name: String, dir: String): String = {
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      qe.toRdd.count()
      qe.executedPlan.toString
    }
    val sHot = planAt("q_sessionize_auto_hot", "/root/testdata/sf0.01")
    assert(sHot.contains("bkt"),
      s"hot sessionize must take the salted bucket decomposition:\n$sHot")
    val aHot = planAt("q_asof_auto_hot", "/root/testdata/sf0.01")
    assert(aHot.contains("__bkt"),
      s"hot as-of must take the salted bucket decomposition:\n$aHot")
    // the tolerance/forward variants route through the same dispatch
    // (r18): natural data plain, hot fixture salted — in BOTH as-of
    // directions (forward is the salted core's min_by/desc mirror)
    assert(!plan("q_asof_tolerance").contains("__bkt"),
      "unskewed tolerance as-of must take the plain branch")
    assert(!plan("q_asof_forward").contains("__bkt"),
      "unskewed forward as-of must take the plain branch")
    val tHot = planAt("q_asof_tolerance_hot", "/root/testdata/sf0.01")
    assert(tHot.contains("__bkt"),
      s"hot tolerance as-of must take the salted decomposition:\n$tHot")
    val fHot = planAt("q_asof_forward_hot", "/root/testdata/sf0.01")
    assert(fHot.contains("__bkt"),
      s"hot forward as-of must take the salted decomposition:\n$fHot")
  }
}
