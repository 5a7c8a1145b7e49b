package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Generates PLANS.md: captured physical plans for the headline queries,
  * with the evidence lines that matter (PushedFilters, join strategies,
  * WholeStageCodegen spans) called out. Re-run after plan-affecting
  * changes: sbt "runMain graft.tools.PlanAudit [sfDir] [out]" */
object PlanAudit {

  val Audited: Seq[(String, String)] = Seq(
    "q1_pricing" -> "scan + decimal hash-aggregate; filter pushed to parquet",
    "q_pushdown" -> "range + IN-list + inequality predicates all pushed",
    "q_validity_join" -> "tiny validity dim -> BroadcastNestedLoopJoin (right plan for 5 rows)",
    "q_range_bucketed" -> "non-equi time join rewritten as day-bucket equi-join",
    "q_expstate" -> "distinct + outer join + CASE classification",
    "q_knn_cosine" -> "broadcast query side; native dot_long inside codegen",
    "q_minhash_lsh" -> "single-shuffle minhash agg + band-key self-join + candidate verify",
    "q_ann_ivf" -> "broadcast centroids; probed-cell equi-join replaces cross product",
    "q_keyword_contract" -> "contract as literal arrays: zero-shuffle map-only validation, one md5 per (event, hdu)",
    "q_jaccard_lsh" -> "LSH band-key candidates front the exact-Jaccard verify (sub-quadratic best-match)",
    "q_nn_label_ann" -> "(label, sign-bucket) block join; bucket count scales with the largest label block",
    "q_media_features" -> "mapPartitions decode kernel; integer-exact aggregate over inverted histogram",
    "q_audio_features" -> "REAL javax.sound WAV decode kernel; lang rides through the kernel — no join, single aggregate exchange",
    "q_video_meta" -> "REAL ISO-BMFF box walk in a map-only kernel — zero exchanges, row-per-media projection",
    "q_nb_quality" -> "one-pass NB training: explode + hash-agg vocab, broadcast totals/prior, token-weight equi-join — lmScore's skeleton with a class axis",
    "q_nb_top_tokens" -> "model card: TakeOrderedAndProject over the vocab relation — top-k, never a global sort",
    "q_kmeans" -> "Lloyd iterations: broadcast k centroids + one assignment shuffle each; all-integer arithmetic",
    "q_docids_per_lang" -> "two-phase top-k: per-partition local cap then global merge — NO per-lang window funnel",
    "q_simhash_neardup" -> "banded simhash: per-(band, value) candidate equi-join + exact Hamming verify on candidates only",
    "q_stratified_sample" -> "deterministic mixture sampling: md5-threshold literal filter, no shuffle before the rollup",
    "q_cosine_neardup" -> "banded sign-LSH tables -> distinct candidate pairs -> exact quantized-cosine verify on candidates only",
    "q_dedup_groups" -> "min-label propagation over checkpointed edges: per-iteration one agg + one join, constant lineage",
    "q_text_dedup_groups" -> "full text-dedup chain: LSH candidates -> exact-Jaccard verify at the dup bar -> component resolution",
    "q_contamination" -> "decontamination scan: benchmark shingles broadcast, one corpus pass, asymmetric containment",
    "q_repetition" -> "per-row repetition stats: sorted-array run-length max inside project — ZERO exchanges",
    "q_seq_pack" -> "sharded running-sum packing: window partitions on (lang, shard), never lang alone",
    "q_boilerplate" -> "doc-frequency over distinct shingles (plain count, no count-distinct); bar = max(floor, 1% of docs) via a broadcast 1-row total — scale-stable; tiny boiler set joins back broadcast",
    "q_curation_funnel" -> "capstone drop-reason funnel: per-row signals in the main projection, corpus-level signals (dup drops, contamination, boilerplate) as doc_id equi-joins, one precedence CASE",
    "q_chunk_dedup" -> "chunk-fp owner via hash aggregate + equi-join back (NOT an aggregate window: that plans a full per-partition sort of the chunk table by its md5), then one per-doc re-aggregation",
    "q_canonical_docs" -> "dup groups + quality equi-join -> per-group SortAggregate argmax (one shuffle on the high-cardinality group key; no window funnel)",
    "q_source_profile" -> "one hash aggregation per source + doc_id equi-join for quality",
    "q_length_quantiles" -> "exact quantiles via the histogram trick: corpus -> (lang, n_tok) counts in one hash agg; the window runs over the tiny histogram, not the corpus",
    "q_ann_sq8" -> "int8 scalar quantization: per-dim scales as one broadcast aggregate, integer code dot in codegen, two-phase top-k",
    "q_ann_pq" -> "product quantization (IVFADC): broadcast per-slice codebooks + broadcast ADC lookup table; codes join probed coarse cells only; per-(query, neighbor) partial-aggregated score sum",
    "q_ann_auto" -> "enforced bucketed->IVF cutover: footer-derived corpus size picks the sign-bucket plan below 2^16 buckets, the trained IVF index past it",
    "q_lm_score" -> "unigram-LM scoring: vocab hash-agg + broadcast 1-row total; scoring join explode vs vocab, per-doc re-aggregation",
    "q_gopher_rules" -> "rule filter: every rule a per-row expression (run-length/array forms) — ZERO exchanges",
    "q_source_cap" -> "per-source md5-order cap: PARTIAL WindowGroupLimit truncates each map task to the cap BEFORE the exchange — shuffle carries O(sources*cap)",
    "q_dsir_weights" -> "hashed-ngram importance: 256-bucket ratio table broadcast; explode-join + per-doc mean, all-ppm integer arithmetic",
    "q_semdedup" -> "cluster-blocked semantic dedup: shared Lloyd training, within-cluster pair join + exact cosine verify, per-vector argmin hash agg",
    "q_mixture_temp" -> "sqrt-temperature mixture: one corpus hash-agg, then integer arithmetic + whole-relation window on a langs-sized relation",
    "q_quality_floor" -> "budget-driven floor via the histogram trick: corpus -> (q10k, n) counts in one hash agg; the top-down walk windows over the tiny histogram",
    "q_shingle_novelty" -> "shingle owner = min doc_id hash agg + equi-join back + per-doc re-aggregation (the chunk-dedup skeleton at shingle granularity)",
    "q_corpus_report" -> "data card: shared per-row expressions in one projection + one hash agg per language (count-distinct fp partial-aggregates)",
    "q_winnow_fp" -> "winnowed fingerprints: per-row positional gram hashes materialized once, window-min transform slices the named column — zero exchanges",
    "q_winnow_overlap" -> "overlap best-match: fp equi-join over the winnowed (2.5x thinner) relation -> pair agg -> per-doc argmax; same blocked skeleton as jaccard",
    "q_group_sizes" -> "dup-cluster size histogram: two hash aggs over the sub-linear group table",
    "q_dup_threshold_sweep" -> "jaccard calibration curve: the existing candidate+verify chain plus one hash agg and a window over <=21 histogram rows",
    "q_embedding_stats" -> "per-label vector health card: one projection + one hash agg, exact integer norm stats",
    "q_quality_floor_by_lang" -> "per-stratum budget floor: histogram walk with windows partitioned by lang — histogram-sized, never corpus-sized",
    "q_chunk_semdedup" -> "passage-level SemDeDup: chunk explode -> hashed-bag embedding (two hash aggs) -> shared Lloyd + within-cluster pair verify; no corpus-wide pair join",
    "q_repeat_scrub" -> "intra-doc repeat removal: zip-shift positional grams (O(L) per doc), first-occurrence hash agg, span explode, (doc,pos) anti-join, ordered reassembly agg",
    "q_pii_scan" -> "PII census + redaction fp: codegen'd regex projection — ZERO exchanges",
    "q_leakfree_split" -> "group-side split: materialized-group left join + per-row md5 coin on the representative — linear, no window",
    "q_ppl_buckets" -> "CCNet thirds: lm-score chain + histogram threshold walk + broadcast 1-row threshold join",
    "q_media_neardup" -> "frame-signature near-dup: df-capped signature equi-join + per-pair count + per-media argmax — candidates only, no payload compare",
    "q_tfidf_topk" -> "per-doc keywords: tf hash-agg + df over tf + token equi-join; rank<=k sits on the window so a PARTIAL WindowGroupLimit caps each task before the exchange",
    "q_source_overlap" -> "source-pair dup matrix from per-group source multiplicities: group table -> (rep, source, c) hash agg -> rep_id self-join emits c_a*c_b — |sources|^2 output, never member x member",
    "q_cluster_keywords" -> "cluster labels: cluster-tf and corpus-df hash aggs + token join; two-phase top-k on the LOW-cardinality cluster key (local rank then <=k*P merge, no vocab funnel)",
    "q_bitext_margin" -> "margin mining: broadcast probe set x target corpus, two-phase top-2, integer 1e-4 margins; production candidates come from the persisted ANN index",
    "q_hubness" -> "k-occurrence census: broadcast trained centroids, probed-cell membership join (~n^1.5 pair work), one hash agg over the top-k relation, left join back for zeros",
    "q_bigram_score" -> "bigram conditional scoring: zip-shift bigram relation, two vocab hash-aggs + w1 equi-join, scoring join + per-doc re-aggregation — the lmScore skeleton one order up",
    "q_collocations" -> "PMI lift in DECIMAL(38,0): three hash aggs over one exploded relation + vocab equi-joins; top-20 is ORDER BY + LIMIT -> TakeOrderedAndProject, never a global window",
    "q_detector_venn" -> "three banded detectors' pair relations venn'd by two full joins on the (id_a, id_b) key + one <=8-row agg — no detector re-verifies the others' work",
    "q_signal_agreement" -> "two linear signal chains joined on doc_id, <=9-cell contingency agg + broadcast 1-row total",
    "q_crossdoc_scrub" -> "corpus-df boilerplate removal: distinct (doc, gram) df agg, tiny over-common set joined back, coverage explode + (doc,pos) anti-join + ordered reassembly — the repeat-scrub skeleton",
    "q_snapshot_diff" -> "content churn: two distinct-fp hash aggs + full-outer equi-join on the fingerprint + one 1-row agg — bounded by distinct content, not corpus rows",
    "q_dsir_sample" -> "importance resampling: the dsir-weights chain + broadcast 1-row total; accept is a per-row wide-decimal coin compare — no shuffle past the weights chain",
    "q_lsh_recall" -> "banding recall harness: probe-stratum brute-truth shingle join + banded candidates restricted to probes; the compare left-joins two probe-sized pair relations",
    "q_group_purity" -> "dup-group QA: member shingles join their OWN rep's shingles only (never a pair relation), per-(member,rep) agg + size-bucket rollup over the sub-linear group table",
    "q_mixture_realized" -> "epoch expansion: langs-sized plan broadcast + per-row integer coin + one hash agg — linear, no shuffle before the rollup",
    "q_dup_token_share" -> "headline drop share: (groups inner-join quality) minus canonical picks names the drops (same base as the keep ranking), one linear token pass, one global aggregate",
    "q_semdedup_auto" -> "SemDeDup at corpus-sized cells (ivfCells(n) ~ sqrt(n) from parquet footers): same cluster-blocked shape as q_semdedup with per-cluster occupancy ~sqrt(n) — the plan that survives 100x",
    "q_hubness_auto" -> "hubness census at corpus-sized cells: probed-membership join stays on the n^1.5 envelope instead of the fixed-cell quadratic",
    "q_chunk_semdedup_auto" -> "chunk SemDeDup with cells sized from the chunk count — the production shape of the chunk twin",
    "q_shared_spans" -> "exact substring runs: checkpointed positional-gram relation, df-capped hash equi-join, diagonal-island window on the high-cardinality (pair, diag) key, per-pair argmax",
    "q_span_scrub" -> "cross-doc span removal: the shared runs relation + span explode (span-sized), (doc,pos) anti-join, ordered reassembly agg — the repeat-scrub skeleton",
    "q_shared_spans_cand" -> "the production span plan: winnow-candidate pairs prune each positional-join side (semi-joins) and bound the match relation — identical answer, candidate-bounded join",
    "q_asof_join" -> "as-of join as union + running last() over ONE (user)-window — single key exchange, no range join, no pair blow-up; right-before-left order at equal ts makes at-or-before inclusive",
    "q_asof_tolerance" -> "same single-shuffle as-of plan; staleness is a post-filter on the one matched row (integer-microsecond compare), never a second range condition in a join",
    "q_asof_forward" -> "forward as-of (time-to-next-event): the same union-window plan with reversed order — earliest at-or-after match, integer-second latency, one key exchange",
    "q_approx_quantiles" -> "quantile sketch with a rank-error contract: exact picks via the histogram trick (windows over distinct values, not the corpus) + one mergeable percentile_approx buffer per group; booleans assert the sketch inside its (p±ε) band",
    "q_sessionize" -> "gap sessionization: lag + running-sum flags in one (user)-window; the session aggregate's key has user_id as a prefix so it reuses the window's hashpartitioning — ONE exchange total",
    "q_event_funnel" -> "ordered funnel: per-stage user-keyed min-aggregates over the previous stage's survivors — |users|-sized chain after stage 1, no event self-join, no window",
    "q_retention" -> "retention cohorts: distinct (user, week) pass + user equi-join + integer week-offset division — |users x weeks| rows, exact microsecond arithmetic",
    "q_bloom_dedup" -> "bloom admission gate, NATIVE (r15): bloom_agg builds the bit array as a TypedImperativeAggregate (partial ORs map-side), the codegen'd bloom_might_contain filters the batch BELOW the verify semi-join — no UDF; result exact by no-false-negatives",
    "q_bloom_bits" -> "bit-exact bloom census: native aggregate -> word x bit explode of the ACTUAL array -> sorted-positions fingerprint; DuckDB recomputes every position from the chained-md5 slice idiom",
    "q_bloom_probe" -> "membership verdicts incl. DETERMINISTIC false positives: codegen'd probe over the plan-literal word array; the oracle recomputes containment from the planted keys' positions",
    "q_bpe_batched" -> "batched BPE rounds: one distributed pair-count job + (batchCap+1)-row collect per round admits a disjoint merge prefix; nested sentinel replaces chunked at 64 per projection with lineage resets",
    "q_asof_salted" -> "skew-salted as-of: window key (user, 7-day time bucket) splits a hot key across its time range; FILTER'd per-bucket argmax summary + bucket-count-sized carry window + coalesce merge — result-identical to the plain form, no range join",
    "q_sessionize_salted" -> "skew-salted sessionization: local gap-flag running sum per (user, 7-day bucket), buckets-sized carry window restores global session numbers (cum_before + local - cont), co-partitioned equi merge join — result-identical to q_sessionize, hot key sorts across its time range",
    "q_event_funnel_n" -> "config-driven N-stage funnel: the same user-keyed min-aggregate fold at 4 stages — each stage |users|-sized, equal-ts rule at every hop, no window, no event self-join",
    "q_merge_groups" -> "incremental group fold: delta edges re-expressed in rep space (two equi-joins to current reps), components run on the DELTA graph only, one left-join relabeling pass over the existing labeling — untouched components never enter the loop",
    "q_image_dhash" -> "real BMP decode -> 9x8 luminance grid -> 64 gradient bits in a map-only kernel; the synthesis is pure column hex assembly, so the only exchange is none",
    "q_image_dhash_neardup" -> "perceptual near-dup: signatures decoded ONCE (eager checkpoint — the self-join sides scan materialized blocks, no second decode kernel); band values above the max(100, n/20) df cap dropped BEFORE the 4x16-bit band equi-join (the ONLY pair producer); verify = codegen'd xor+bit_count over packed halves",
    "q_audio_fp" -> "real javax.sound PCM decode -> 65 window energies -> 64 gain-invariant gradient-sign bits in a map-only kernel; synthesis is pure column hex assembly, so the only exchange is none",
    "q_audio_fp_neardup" -> "audio perceptual near-dup through the SAME banded-Hamming matcher as the image path: single checkpointed decode, df-capped band equi-join only pair producer, xor+bit_count verify",
    "q_video_dhash_neardup" -> "offset-tolerant video near-dup: frames decoded ONCE (checkpoint feeds census + both join sides), media-frequency df cap before the band-only join, matches coalesce per (pair, idx_a-idx_b) diagonal so head-trimmed re-encodes align; run windows over pair-diagonal partitions",
    "q_sketch_overlap" -> "sketched cross-source shingle overlap: mergeable Datasketches-HLL per source (partial_hll_sketch_agg = map-side combine, shuffle carries |sources| 4KiB buffers), broadcast pair self-join over the tiny sketch table, inclusion-exclusion estimates contract-checked against the exact intersection",
    "q_sliding_wau" -> "trailing 7-day distinct users from daily mergeable HLL sketches: one event scan -> per-day sketch, each sketch EXPLODED to its <=7 window ends (equi-shuffle on win_end, never a range join), hll_union_agg per window; exact arm bundled for the contract booleans",
    "q_fixed_k_sample" -> "exact-k per-stratum sample, skew-safe: phase-1 row_number windows on (stratum, md5-sub-bucket) keep local top-k (exact superset by the some-bucket argument), phase-2 re-ranks <= buckets*k survivors per stratum — a hot stratum never serializes into one sort; md5-rank determinism, result-identical to the single-window form",
    "q_rate_anomaly" -> "event-rate spike vs calendar-exact trailing week: one event hash-agg to (type, day) counts, each count EXPLODED to the 7 window ends it precedes (equi-shuffle, never a range join; quiet gaps stay out of the baseline, unlike rows-between), integer ppm ratio + 3x bar",
    "q_top_paths" -> "top-k 3-step event paths: two lead()s on the family's one user-keyed window, |types|^3-bounded hash agg, deterministic (n desc, path) TakeOrderedAndProject tail — no global sort",
    "q_growth_accounting" -> "weekly growth accounting (new/retained/resurrected/churned-after): one corpus distinct to (user, week), lag/lead on a user-keyed window over the |user-weeks| relation, one tiny aggregate; integer datediff==7 calendar logic, identities spec-pinned",
    "q_scene_changes" -> "video shot-boundary pass through the REAL RIFF walk + real per-frame decode (map-only kernel, no exchange before the write): adjacent-frame |delta-luma| sums integer-exact via lumaRaw (raw raster samples — getRGB's ICC gray->sRGB curve would break absolute arithmetic), synthesis is pure column hex assembly",
    "q_quality_percentile" -> "per-language percentile calibration via the HISTOGRAM TRICK: ranks from the bounded (lang, q10k<=10000) count relation (one cumulative window over <=|langs|*10001 rows), BROADCAST back onto the scan — the only corpus-sized work is one hash agg + one map-side probe, never a per-language range sort",
    "q_prod_wau" -> "production sliding WAU: the estimate arm reads a STORED daily-sketch parquet table (|days| 4-KiB rows, no event re-scan — the posture the streaming rollup maintains); exact contract arm bundled for oracling",
    "q_prod_sketch_overlap" -> "production sketched overlap: estimates from a STORED per-source sketch table (|sources| rows, corpus never re-read); exact contract arm bundled for oracling",
    "q_conversion_latency" -> "click->purchase latency quantiles: the forward as-of single-shuffle chain feeds the histogram trick (windows over DISTINCT latency values, one hash agg from the pair relation) + a percentile_approx rank-bound contract; unconverted clicks excluded with the denominator reported",
    "q_table_profile" -> "table profiler: per profiled column a 3-aggregate chain (stats, exact distinct, deterministic mode) over a ReadSchema-pruned scan — total I/O is the profiled columns once, never |cols| full-table scans; sampling hook documented for very large corpora",
    "q_prod_canonical_docs" -> "the materialize-once production plan: canonical argmax over a STORED parquet group table — one scan + one SortAggregate shuffle, no LSH chain in the plan",
    "q_prod_curation_funnel" -> "production funnel: one aggregation over the STORED per-doc stages table — the 8-stage verdict logic paid once at materialization, never per report",
    "q_bm25_topk" -> "integer-exact BM25: 1-row corpus stats (N, S, every df) broadcast onto the scoring scan; per-doc tf is an array filter on the row's own tokens (no exploded join); TakeOrderedAndProject tail",
    "q_rrf_fusion" -> "hybrid retrieval: BM25 arm + broadcast-probe cosine arm each end in TakeOrderedAndProject, so rank windows and the full-outer fusion join run over <= 2*RrfDepth constant rows",
    "q_hard_negatives" -> "DPR-style triple mining: tiny (probe x term) relation broadcast onto the corpus tf aggregate (lmScore join shape), low-cardinality two-phase local cap on the lexical arm, anti-join + triple assembly over <= HnQueries*HnLexK constant rows",
    "q_prod_bm25_topk" -> "index-served BM25: stored vocab df table sliced by an IN-list filter + stored 1-row stats, pivoted and broadcast onto the ONE scoring scan — the build/serve split makes query latency one corpus pass",
    "q_kn_heldout" -> "Kneser-Ney held-out scoring: bigram-TYPES table feeds fan-out/continuation as plain row-counts (no count-distinct over occurrences), 1-row N_types broadcast, scoring = held explode left-joined to vocab-sized tables — no window anywhere",
    "q_heavy_hitters" -> "Misra-Gries census via native TypedImperativeAggregate: partial_mg_topk BELOW the exchange ships <= k counters per partition; exact side grades the contract, 1-row total broadcast-NLJ",
    "q_sketch_bounds" -> "grouped MG sketches (one per lang) with map-side partial merge; presence + undercount-bound booleans against the exact census — ObjectHashAggregate, no window",
    "q_countmin" -> "count-min table via native TypedImperativeAggregate: one scan, d*w longs per partition over the shuffle, deterministic counters (the oracle recomputes every bucket sum) — the exact census this replaces shuffles the vocabulary",
    "q_countmin_est" -> "point-frequency estimates: 1-row sketch broadcast onto 4 probe rows, buckets recomputed in the SQL md5/conv idiom (pins kernel == column expression), min over rows + overestimate contract",
    "q_cm_joinsize" -> "join-size estimation: two one-pass CM sketches, per-row dot product through the codegen'd dot_long kernel, min over 4 rows vs the exact vocab-join size — the planner statistic that replaces a two-vocabulary shuffle with two 8 KB buffers",
    "q_unicode_norm" -> "codegen'd NFC + strip-accents expressions in a map-only projection — zero exchanges; the normalizer rides inside the scan's whole-stage-codegen span",
    "q_norm_dedup" -> "normalization-keyed exact dedup: the standard fingerprint hash-groupBy with graft_nfc canonicalizing the key inside the scan projection",
    "q_keyword_hits" -> "broadcast Aho-Corasick automaton, one O(len+matches) scan per doc in a map-only kernel — zero exchanges whatever the dictionary size",
    "q_keyword_tag" -> "doc-level rollup over the automaton hits: one doc_id hash agg (min_by dominant term — no window) + join back to lengths",
    "q_event_transitions" -> "Markov matrix: one user_id window (lead) over the event stream + hash agg; the ppm normalization windows over the |types|^2 aggregate, never the stream",
    "q_homoglyph_dedup" -> "confusable-fold dedup: built-in translate composed with graft_nfc inside the scan projection; the standard fingerprint hash-groupBy on the folded key",
    "q_chat_render" -> "conversation -> ChatML string: fixture synthesis + render all in ONE map-only projection (transform/array_join string expressions) — zero exchanges",
    "q_loss_mask" -> "assistant-only mask accounting: two aggregate() folds over the turns array per row, integer density — zero exchanges",
    "q_pref_stats" -> "preference-corpus audit (degenerate/tied/inverted classes + length-bias pct): map-only pair synthesis folded to ONE aggregate row — the whole audit is a single pass",
    "q_anneal_schedule" -> "curriculum mixture schedule: ONE corpus hash-agg (count/tokens/quality-sum per lang), then the 3-phase weighting explodes on the langs-sized aggregate — never the corpus; per-phase share windows run over a handful of rows",
    "q_pref_kappa" -> "Cohen's kappa over preference labels: one aggregate to (n, agree, marginals), the po/pe form cross-multiplied to non-negative longs — single pass, one row",
    "q_dpo_render" -> "DPO branch render: admitted-pair filter + two ChatML string builds + loss accounting all in one map-only projection — zero exchanges",
    "q_zorder_layout" -> "tile-aligned layout census: 1-row stats broadcast onto the scan, map-side Morton interleave, <=16-row histogram window, broadcast tile->file map, 16-group box aggregate",
    "q_zorder_incremental" -> "OPTIMIZE-on-append maintenance: three per-phase box censuses over one keyed derivation (base tiles, base + arrival-ordered append stripes, projected rewrite), histogram windows over <=256-row tile tables only; the trigger compares measured candidate-file counts",
    "q_pdf_extract" -> "real PDF kernel (stream discovery + BT/ET text-operator walk) in a map-only Dataset.map over column-synthesized containers — zero exchanges before the final projection",
    "q_retrieval_eval" -> "planted-qrels eval: per-query real-BM25 stats+score passes (1-row stats broadcast each), one dense scan with broadcast one-hot probes through dot_long, rank windows over planted-sparse candidate sets, constant-size metric aggregates",
    "q_image_whash_neardup" -> "spectral (WHT) near-dup: checkpointed single-decode signature relation, df-capped band equi-join, codegen'd xor+bit_count verify — the dHash matcher discipline over the integer spectrum",
    "q_k_anonymity" -> "release-risk census: one hash-agg over the quasi-identifier tuple with map-side combine; class count bounded by |langs|x|sources|x|buckets|",
    "q_k_generalize" -> "generalization ladder: one aggregate per rung over the same scan, 3 rows out; at-risk population monotone down the ladder",
    "q_l_diversity" -> "attribute-disclosure census: PII-class CASE inside the scan projection (codegen'd regex), one hash-agg with a count_distinct arm",
    "q_release_risk" -> "k-anonymity over what SHIPS: funnel stage pass -> admitted semi-join -> quasi-class census -> per-lang exact ppm; everything past the stage pass is class-table-sized",
    "q_link_graph" -> "doc->domain edge aggregation: ONE shuffle over docs to the weighted |domains|^2-bounded graph; rank dim broadcast both ways",
    "q_pagerank" -> "integer PageRank: checkpointed domain graph (doc scan runs once), 5 chained join+partial-agg rounds over the TINY graph — nothing corpus-sized iterates",
    "q_pagerank_seeded" -> "personalized PageRank: same checkpointed-graph loop with the teleport restricted to the majority-en seed flags; one census + one edge pass",
    "q_link_reciprocity" -> "link-farm census: checkpointed domain graph self-joined on reversed keys, degree aggs + least() reciprocal mass, full-outer assembled on the node dim",
    "q_authority_quota" -> "authority-weighted sampling quota: checkpointed pagerank relation + 1-row total broadcast, integer share per source joined to the per-source doc census",
    "q_encoding_repair" -> "mojibake repair: the graft_fix_mojibake kernel rides inside the scan's codegen span — pure map, zero exchanges",
    "q_url_canonical" -> "URL canonicalization: regexp/list built-ins only, one codegen'd projection over the scan — zero exchanges",
    "q_url_key_dedup" -> "URL-key dedup: dedup-key canonicalization in the scan projection, one hash-groupBy on the canonical key (exact dedup's shuffle with a canonical key)",
    "q_unigram_vocab" -> "unigram-LM trainer: one corpus reduction to the distinct-word relation, then per-EM-round one broadcast-cost kernel map + one usage hash-agg; final costs from a 1-row total broadcast",
    "q_unigram_encode" -> "frozen-vocab unigram encode: Viterbi kernel map over the word relation with the broadcast cost table — vocabulary-sized, one shuffle (word census)",
    "q_tokenizer_compare" -> "BPE vs unigram fertility: both trained segmentations joined onto one corpus token explode (both vocab-sized, broadcastable), re-grouped to |langs| rows",
    "q_clean_pipeline" -> "composed cleaning pass: repair -> NFC -> homoglyph fold in ONE codegen'd projection over the scan — zero shuffles, zero extra scans",
    "q_authority_sample" -> "authority-weighted sampling: node-sized rank/rate tables broadcast onto ONE corpus scan with the md5 coin in the projection; per-domain rollup",
    "q_domain_card" -> "domain scorecard: one checkpointed census + one checkpointed edge pass; rank loop, quota, degrees and language spread all assembled node-sized",
    "q_unigram_coverage" -> "unigram OOV card: trained segmentation broadcast onto one corpus token explode, re-grouped to |langs| rows",
    "q_cdc_dedup" -> "content-defined chunking: posexplode + per-doc running boundary-count window (sessionize discipline), per-chunk fp aggregate, then the chunk-dedup owner hash-agg + join back",
    "q_json_parse" -> "schema-declared from_json in a map-only projection — the Jackson parse rides inside the scan's codegen span; zero exchanges",
    "q_fuzzy_pairs" -> "deletion-neighborhood blocking: len+1 keys per record exploded, key equi-join (complete dist<=1 candidates, never all-pairs), distinct, levenshtein verify on candidates only",
    "q_rollup" -> "ROLLUP via Expand: one replica per grouping set BEFORE partial aggregation — the exchange carries group rows only",
    "q_pivot" -> "declared-value-list pivot: one scan, one hash aggregate, each cell a conditional count — no per-value scans",
    "q_skew_profile" -> "per-key census arms: partial-aggregated key counts (exchange carries ~distinct keys), 1-row rollups + broadcast hot-key pick",
    "q_gap_fill" -> "calendar-spine resample: (user, day) hash agg, per-user span agg + spine explode, left join back, per-user forward-fill window — all partitioned by user_id",
    "q3_shipping" -> "TPC-H Q3 shape: segment dimension broadcast, fact-key equi-join, decimal-exact revenue agg, TakeOrderedAndProject top-10 (never a global sort)",
    "q5_region_revenue" -> "TPC-H Q5 shape: region->nation->customer and supplier all broadcast; orders joins lineitem on the fact key — the only real shuffle; decimal-exact revenue per nation",
    "q_scd2_intervals" -> "gaps-and-islands: lag flag + running sum + lead, all three windows partitioned by user_id; one island aggregate between",
    "q_session_window" -> "native session_window: one hash-aggregate pass with session merge — no window function, no per-user sort chain; the same expression groups a watermarked stream",
    "q_merge_upsert" -> "MERGE semantics: one full-outer equi-join on the table key + match-state CASE; audit = 1-row aggregate with order-insensitive bit_xor fingerprint",
    "q_psi_drift" -> "PSI: one quality pass -> 21-key hash aggregate; spine join and totals constant-size, logs fixed-point in the projection",
    "q_dq_checks" -> "expectations gate: one partial-aggregated arm per rule, unioned — one scan per distinct relation",
    "q_dup_triangles" -> "triangle census: persisted ordered pair relation, wedge self-join at the smallest vertex + one closing equi-join (each triangle once, never all-pairs), degree-census wedges, 1-row sealed output",
    "q_sessionize_auto" -> "skew-census dispatch, PLAIN branch (natural skew ~130 < 800): one partial-aggregated key census on the driver, then sessionize's single (user)-window + shuffle-reusing aggregate",
    "q_sessionize_auto_hot" -> "skew-census dispatch, SALTED branch (even-user fold, skew ~3756): (user, time-bucket) local windows + buckets-sized carry window restore global session ids — the hot key's sort spreads across its time range",
    "q_asof_auto" -> "skew-census dispatch over the union of both key columns, PLAIN branch: asof's single union + running-last window",
    "q_asof_auto_hot" -> "skew-census dispatch, SALTED branch: per-(key, bucket) running-last + FILTER'd per-bucket argmax summaries + carry window, matched = coalesce(local, carry)",
    "q_warc_extract" -> "WARC ingest: column-synthesized 3-record files -> map-only record-split + HTTP-unwrap + HTML-extract kernel chain — zero exchanges before the final projection",
    "q_warc_digest_dedup" -> "crawl-level exact dedup: map-only record split, then ONE partial-aggregated exchange on the declared payload digest — no payload ever hashed or compared",
    "q_warc_pairs" -> "request<->response pairing: one split pass feeds both filtered relations, one equi-join on the globally-unique WARC-Concurrent-To reference — key-partitioned, no window",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plan audit\n\n")
    sb.append(s"Generated by `graft.tools.PlanAudit` on `$sfDir`. For each\n")
    sb.append("headline query: the formatted physical plan (simple mode) and\n")
    sb.append("the scan/join evidence lines.\n")
    Audited.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val evidence = df.queryExecution.toString.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .map(_.trim).toSeq.distinct
      sb.append(s"\n## $name\n\n_${why}_\n\n")
      if (evidence.nonEmpty)
        sb.append(evidence.map(e => s"- `${e.take(200)}`").mkString("\n"))
          .append("\n")
      sb.append("\n```\n").append(plan.linesIterator.take(40).mkString("\n"))
        .append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.result())
    println(s"[audit] wrote $out (${Audited.size} plans)")
    spark.stop()
  }
}
