package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** [EXT] SFT / chat-data preparation — the operator family between a
  * curated text corpus and an instruction-tuning run (the north-star
  * brief's training-data pipeline, final stage): chat-template
  * rendering, role-alternation admission, loss-mask token accounting,
  * and per-role corpus stats. The reference has no analogue (it routes
  * whole files — `bin/save_DBB_stagein_to_DBB.py:36-45`); this family
  * exists because an LLM training pipeline's last mile consumes
  * CONVERSATIONS, not documents, and every trainer-side bug class here
  * (template drift, role-order corruption, wrong loss masks) is
  * cheapest to catch at the data layer.
  *
  * Representation: a conversation is an `array<struct<role, content>>`
  * column — the natural Spark shape (one row per conversation, turns
  * nested). Every operator below is an expression-only composition
  * (`transform`/`filter`/`zip_with`/`aggregate` + string functions)
  * over that column: map-side, no UDF, no shuffle except the final
  * per-role census. At 100 TB the family divides by executors like the
  * decode kernels.
  *
  * Fixture discipline ([[TextOps.htmlDocs]], [[MultimodalOps]]): the
  * corpus has no conversation column, so [[chatDocs]] synthesizes one
  * from each document's whitespace tokens with PLANTED arithmetic a
  * DuckDB oracle can recompute — 8-token turns, a system turn on every
  * 3rd doc, strict user/assistant alternation, and a deterministic
  * role-corruption fault on every 7th doc (the [[DedupOps.MergeDeltaMod]]
  * fault-injection idiom) so the validator has real violations to
  * catch. The OPERATORS never see the arithmetic — they read the
  * materialized conversation column, exactly as they would a real SFT
  * corpus; only the fixture and the oracle share the planted math.
  */
object ChatOps {

  /** Tokens per synthesized turn (last turn keeps the remainder). */
  val TurnToks = 8

  /** Every `SysMod`-th doc opens with a system turn. */
  val SysMod = 3

  /** Every `FaultMod`-th doc (with ≥ 3 turns) has turn 2's role
    * overwritten with turn 1's — an adjacent-duplicate role corruption
    * the alternation validator must flag (and, when turn 2 is last,
    * an ends-on-wrong-role violation too). */
  val FaultMod = 7

  /** Special-token overhead a rendered turn adds beyond its content
    * tokens: the `<|im_start|>role` prefix and `<|im_end|>` suffix. */
  val TurnOverheadToks = 2

  /** Of [[TurnOverheadToks]], the part that participates in the loss
    * for assistant turns: the model must learn to EMIT `<|im_end|>`
    * (stop decision), while `<|im_start|>role` is always forced. */
  val LossExtraToks = 1

  private val RoleSys = "system"
  private val RoleUser = "user"
  private val RoleAsst = "assistant"

  /** Deterministic conversation synthesis from the documents table:
    * (doc_id, conv) where conv is `array<struct<role, content>>` built
    * by the planted arithmetic above. Docs with zero tokens are
    * dropped (absent from this corpus; the guard keeps synthesis
    * total). */
  private[graft] def chatDocs(docs: DataFrame): DataFrame = {
    val hasSys = col("doc_id") % SysMod === 0
    // base role of turn t: system at t=0 on system docs, then strict
    // user/assistant alternation (k = t minus the system offset; all
    // operands non-negative, so div/mod agree cross-engine)
    def baseRole(t: Column): Column =
      when(hasSys && t === 0, lit(RoleSys))
        .when((t - when(hasSys, 1).otherwise(0)) % 2 === 0, lit(RoleUser))
        .otherwise(lit(RoleAsst))
    val faulted = col("doc_id") % FaultMod === 0 && col("n_turns") >= 3
    def role(t: Column): Column =
      when(faulted && t === 2, baseRole(lit(1))).otherwise(baseRole(t))
    docs
      .withColumn("w", TextOps.toks(col("text")))
      .where(size(col("w")) >= 1)
      .withColumn("n_turns",
        expr(s"CAST((size(w) + ${TurnToks - 1}) div $TurnToks AS INT)"))
      .select(col("doc_id"), transform(
        sequence(lit(0), col("n_turns") - 1),
        t => struct(
          role(t).as("role"),
          array_join(slice(col("w"), (t * TurnToks + 1).cast("int"),
            lit(TurnToks)), " ").as("content"))).as("conv"))
  }

  /** CHAT-TEMPLATE RENDER — conversation → the single training string
    * a tokenizer consumes, in the public ChatML-style framing
    * (`<|im_start|>role\ncontent<|im_end|>\n` per turn). Pure string
    * expressions over the conversation column (one `transform` + one
    * `array_join`): map-side, codegen-friendly, zero shuffle. Output
    * is the render's census (length + md5) so the oracle hash-checks
    * the EXACT rendered bytes without shipping them. */
  def chatRender(spark: SparkSession, dir: String): DataFrame =
    chatDocs(Tables.documents(spark, dir))
      .withColumn("rendered", array_join(transform(col("conv"), c =>
        concat(lit("<|im_start|>"), c.getField("role"), lit("\n"),
          c.getField("content"), lit("<|im_end|>\n"))), ""))
      .select(col("doc_id"), size(col("conv")).as("n_turns"),
        length(col("rendered")).cast("int").as("n_chars"),
        md5(col("rendered").cast("binary")).as("render_fp"))

  /** ROLE-ALTERNATION ADMISSION — the structural gate an SFT corpus
    * passes before rendering: system only in position 0, first
    * non-system turn is user, roles strictly alternate after that,
    * conversation ends on assistant (a trailing user turn trains
    * nothing). Reads ONLY the conversation column (array predicates
    * over the roles — `exists`/`zip_with`/`forall`), so it gates a
    * real corpus as-is; the planted [[FaultMod]] corruption and the
    * organic trailing-user parity give every boolean both values.
    * One row per conversation, map-side. */
  def chatValidate(spark: SparkSession, dir: String): DataFrame = {
    val r = col("roles")
    // roles with system stripped: alternation is judged on the
    // user/assistant sequence (a misplaced system is flagged
    // separately by sys_only_first, not double-counted here)
    val rr = filter(r, x => x =!= RoleSys)
    chatDocs(Tables.documents(spark, dir))
      .withColumn("roles", transform(col("conv"), c => c.getField("role")))
      .select(col("doc_id"), size(col("roles")).as("n_turns"),
        (element_at(r, 1) === RoleSys).as("has_system"),
        (!exists(slice(r, lit(2), greatest(size(r) - 1, lit(0))),
          x => x === RoleSys)).as("sys_only_first"),
        (coalesce(element_at(rr, 1), lit("")) === RoleUser).as("starts_user"),
        forall(zip_with(rr, slice(rr, lit(2), greatest(size(rr) - 1, lit(0))),
          (a, b) => a =!= b), x => coalesce(x, lit(true))).as("alternates"),
        (element_at(r, -1) === RoleAsst).as("ends_assistant"))
      .withColumn("valid",
        col("sys_only_first") && col("starts_user") && col("alternates") &&
          col("ends_assistant"))
  }

  /** LOSS-MASK TOKEN ACCOUNTING — the token-budget numbers an SFT run
    * plans with: per conversation, total tokens the render consumes
    * (content + [[TurnOverheadToks]] per turn) vs tokens that carry
    * loss under the standard assistant-only mask (assistant content +
    * the emitted `<|im_end|>`). `loss_pct` is the mask density —
    * integer-exact (`*100 div`, all operands non-negative) so it
    * crosses the oracle bit-identically. The per-turn content token
    * counts come from RE-TOKENIZING the conversation's content (the
    * operator trusts the column, not the synthesis arithmetic). One
    * `aggregate` over the turns array per row: map-side, no shuffle. */
  def lossMask(spark: SparkSession, dir: String): DataFrame = {
    def contentToks(c: Column): Column =
      size(TextOps.toks(c.getField("content"))).cast("long")
    chatDocs(Tables.documents(spark, dir))
      .select(col("doc_id"), size(col("conv")).as("n_turns"),
        aggregate(col("conv"), lit(0L),
          (acc, c) => acc + contentToks(c) + TurnOverheadToks)
          .as("n_tok_total"),
        aggregate(col("conv"), lit(0L), (acc, c) =>
          acc + when(c.getField("role") === RoleAsst,
            contentToks(c) + LossExtraToks).otherwise(0L))
          .as("n_tok_loss"))
      .withColumn("loss_pct",
        expr("CAST(n_tok_loss * 100 div n_tok_total AS INT)"))
  }

  /** PER-ROLE CORPUS CENSUS — turn counts and content-token mass by
    * role across the corpus (the mixture table an SFT run reports
    * next to its data card): explode to one row per turn, partial-agg
    * groupBy on a 3-value key. The only shuffling query of the family
    * — 3 groups after map-side combine. avg is integer-exact
    * (`*100 div`). */
  def chatTurnStats(spark: SparkSession, dir: String): DataFrame =
    chatDocs(Tables.documents(spark, dir))
      .select(explode(col("conv")).as("turn"))
      .select(col("turn.role").as("role"),
        size(TextOps.toks(col("turn.content"))).cast("long").as("n_tok"))
      .groupBy(col("role"))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("n_tok")).as("tot_toks"))
      .withColumn("avg_toks_x100",
        expr("CAST(tot_toks * 100 div n_turns AS BIGINT)"))

  /** SEQUENCE PACKING FOR SFT — conversations through the corpus
    * packing machinery ([[CurationOps.packSequences]]: sharded
    * first-fit running sum, no low-cardinality window): each
    * conversation's RENDER cost (content tokens + per-turn overhead,
    * the [[lossMask]] total) packs into [[CurationOps.PackBudget]]
    * bins, rolled up per language — the table an SFT run sizes its
    * epoch from. Conversations pack WHOLE (a split conversation is a
    * broken training example); the oracle recomputes the identical
    * window arithmetic. */
  def chatPack(spark: SparkSession, dir: String): DataFrame = {
    val toks = chatDocs(Tables.documents(spark, dir))
      .select(col("doc_id"), aggregate(col("conv"), lit(0L), (acc, c) =>
        acc + size(TextOps.toks(c.getField("content"))).cast("long") +
          TurnOverheadToks).as("tok"))
    val withLang = toks.join(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      Seq("doc_id"))
    CurationOps.packSequences(withLang, "doc_id", "lang", col("tok"))
      .groupBy(col("lang"), col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_convs"), sum(col("tok")).as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("n_convs")).as("n_convs"),
        sum(col("n_tok")).as("n_tokens"),
        max(col("n_tok")).as("max_seq_tokens"))
  }

  // --- preference-pair (DPO/RLHF) prep --------------------------------

  /** Prompt tokens per synthesized preference pair. */
  val PrefPromptToks = 4

  /** Minimum doc tokens to host a pair (prompt + two max-len responses). */
  val PrefMinToks = 16

  /** Every `PrefFaultMod`-th pair is DEGENERATE: rejected is
    * byte-identical to chosen — the annotation-pipeline fault a
    * preference gate must drop (training on it is a zero gradient at
    * best, a NaN at worst). */
  val PrefFaultMod = 7

  /** Planted annotator margin: `margin_x100 = doc_id % 100 − 10`, so
    * ~10% of pairs are INVERTED (negative margin) and ~1% TIED —
    * realistic annotation noise the admission gate filters. */
  val PrefMarginShift = 10

  /** Preference-pair synthesis — the [[chatDocs]] fixture discipline:
    * each ≥[[PrefMinToks]]-token doc becomes one (prompt, chosen,
    * rejected) pair from disjoint token slices, with PLANTED response
    * lengths (chosen `4 + d%3`, rejected `4 + (d div 3)%3` — so
    * length-vs-preference correlation is a measurable ~half, the
    * length-bias audit's ground truth), a planted margin, and the
    * degenerate fault. Operators read only the materialized columns. */
  private[graft] def prefDocs(docs: DataFrame): DataFrame = {
    val lenC = expr("CAST(4 + doc_id % 3 AS INT)")
    val lenR = expr("CAST(4 + (doc_id div 3) % 3 AS INT)")
    val degenerate = col("doc_id") % PrefFaultMod === 0
    docs
      .withColumn("w", TextOps.toks(col("text")))
      .where(size(col("w")) >= PrefMinToks)
      .withColumn("len_c", lenC)
      .select(col("doc_id").as("pair_id"),
        array_join(slice(col("w"), 1, PrefPromptToks), " ").as("prompt"),
        array_join(slice(col("w"), lit(PrefPromptToks + 1), col("len_c")),
          " ").as("chosen"),
        when(degenerate,
          array_join(slice(col("w"), lit(PrefPromptToks + 1),
            col("len_c")), " "))
          .otherwise(array_join(
            slice(col("w"), col("len_c") + (PrefPromptToks + 1), lenR), " "))
          .as("rejected"),
        degenerate.as("degenerate"),
        expr(s"CAST(doc_id % 100 - $PrefMarginShift AS INT)")
          .as("margin_x100"))
  }

  /** PREFERENCE-PAIR VALIDATION — per pair: response token counts, the
    * degenerate flag (identical responses — checked on the CONTENT,
    * not the plant: a synthesis bug would surface as a flag/oracle
    * mismatch), the annotator margin, and the admission verdict
    * (distinct responses AND strictly positive margin). Map-only
    * expressions; the gate a DPO data loader runs before training. */
  def prefPairs(spark: SparkSession, dir: String): DataFrame =
    prefDocs(Tables.documents(spark, dir))
      .select(col("pair_id"),
        size(TextOps.toks(col("chosen"))).as("n_chosen_toks"),
        size(TextOps.toks(col("rejected"))).as("n_rejected_toks"),
        (col("chosen") === col("rejected")).as("degenerate"),
        col("margin_x100"),
        md5(concat_ws(" ", col("prompt"), col("chosen"),
          col("rejected")).cast("binary")).as("pair_fp"),
        (col("chosen") =!= col("rejected") && col("margin_x100") > 0)
          .as("admitted"))

  /** PREFERENCE-CORPUS AUDIT — the one-row report a preference dataset
    * ships with: pair counts by failure class and the LENGTH-BIAS
    * diagnostic (how often the chosen response is strictly longer,
    * over admitted pairs) — the reward-hacking audit: a preference set
    * whose chosen side is longer far above ~50% teaches a length
    * prior, not a quality prior. All-integer; one aggregate. */
  def prefStats(spark: SparkSession, dir: String): DataFrame =
    prefPairs(spark, dir).agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("degenerate"), 1L).otherwise(0L)).as("n_degenerate"),
      sum(when(!col("degenerate") && col("margin_x100") < 0, 1L)
        .otherwise(0L)).as("n_inverted"),
      sum(when(!col("degenerate") && col("margin_x100") === 0, 1L)
        .otherwise(0L)).as("n_tied"),
      sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
      sum(when(col("admitted") &&
          col("n_chosen_toks") > col("n_rejected_toks"), 1L)
        .otherwise(0L)).as("n_chosen_longer"),
      sum(when(col("admitted"), col("margin_x100").cast("long"))
        .otherwise(0L)).as("margin_sum"))
      .select(col("n_pairs"), col("n_degenerate"), col("n_inverted"),
        col("n_tied"), col("n_admitted"),
        expr("CAST(n_chosen_longer * 100 div n_admitted AS INT)")
          .as("chosen_longer_pct"),
        expr("CAST(margin_sum div n_admitted AS INT)")
          .as("avg_margin_x100"))

  /** Second-annotator disagreement rate: annotator B flips A's label
    * on ~1/[[KappaFlipMod]] of pairs, chosen by a deterministic md5
    * coin on the pair id (the [[CurationOps.mixtureRealized]] coin
    * idiom) — INDEPENDENT of the label itself, which an id-arithmetic
    * stride is not (the margin also derives from the id, and a
    * label-correlated flip collapses κ to its chance floor — measured
    * before this coin replaced a `div 10` stride). */
  val KappaFlipMod = 5

  /** INTER-ANNOTATOR AGREEMENT — Cohen's κ over the preference labels,
    * exact-integer (the statistic every human-labeled preference set
    * ships with; raw agreement alone is inflated by the base rate,
    * which κ removes): annotator A's label is the planted margin sign,
    * annotator B agrees except on the [[KappaFlipMod]]-strided ~20%.
    * With n items, `agree` matches, and marginal positives aᵖ/bᵖ,
    * `κ = (agree·n − M)/(n² − M)` where `M = aᵖbᵖ + (n−aᵖ)(n−bᵖ)` —
    * the po/pe form cross-multiplied so every operand is a
    * non-negative long (the repo div discipline; κ ≤ 0 reports 0,
    * "no better than chance"). Degenerate pairs are excluded — they
    * carry no annotatable preference. One aggregate; one row. */
  def prefKappa(spark: SparkSession, dir: String): DataFrame = {
    val labeled = prefDocs(Tables.documents(spark, dir))
      .where(col("chosen") =!= col("rejected"))
      .select(col("pair_id"),
        (col("margin_x100") > 0).as("label_a"))
      .withColumn("flip", expr(
        s"""CAST(conv(substring(md5(CAST(pair_id AS STRING)), 1, 4),
           |  16, 10) AS BIGINT) % $KappaFlipMod = 0""".stripMargin))
      .withColumn("label_b",
        (col("label_a") && !col("flip")) || (!col("label_a") && col("flip")))
    labeled.agg(
        count(lit(1)).as("n_items"),
        sum(when(col("label_a") === col("label_b"), 1L).otherwise(0L))
          .as("n_agree"),
        sum(when(col("label_a"), 1L).otherwise(0L)).as("a_pos"),
        sum(when(col("label_b"), 1L).otherwise(0L)).as("b_pos"))
      .withColumn("chance_m", expr(
        "a_pos * b_pos + (n_items - a_pos) * (n_items - b_pos)"))
      .select(col("n_items"), col("n_agree"),
        expr("CAST(n_agree * 1000000 div n_items AS BIGINT)").as("po_ppm"),
        expr("CAST(chance_m * 1000000 div (n_items * n_items) AS BIGINT)")
          .as("pe_ppm"),
        expr(s"""CAST(CASE WHEN n_agree * n_items > chance_m
                |  THEN (n_agree * n_items - chance_m) * 1000000
                |       div (n_items * n_items - chance_m)
                |  ELSE 0 END AS BIGINT)""".stripMargin).as("kappa_ppm"))
  }

  /** DPO RENDER — each ADMITTED pair as its two training branches
    * (prompt + chosen, prompt + rejected) in the [[chatRender]] ChatML
    * framing, with the loss accounting a DPO loader needs: both
    * branches share the forced prompt tokens, each branch's loss span
    * is its response tokens + the `<|im_end|>` stop decision. Pure
    * string expressions, map-side, hashes grade the exact bytes. */
  def dpoRender(spark: SparkSession, dir: String): DataFrame = {
    def branch(resp: Column): Column = concat(
      lit("<|im_start|>user\n"), col("prompt"), lit("<|im_end|>\n"),
      lit("<|im_start|>assistant\n"), resp, lit("<|im_end|>\n"))
    prefDocs(Tables.documents(spark, dir))
      .where(col("chosen") =!= col("rejected") && col("margin_x100") > 0)
      .select(col("pair_id"),
        md5(branch(col("chosen")).cast("binary")).as("chosen_fp"),
        md5(branch(col("rejected")).cast("binary")).as("rejected_fp"),
        (size(TextOps.toks(col("chosen"))) + LossExtraToks)
          .as("n_loss_chosen"),
        (size(TextOps.toks(col("rejected"))) + LossExtraToks)
          .as("n_loss_rejected"),
        (lit(PrefPromptToks) + size(TextOps.toks(col("chosen")))
          + 2 * TurnOverheadToks).as("n_tok_chosen_branch"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chat_render"     -> chatRender _,
    "q_chat_validate"   -> chatValidate _,
    "q_loss_mask"       -> lossMask _,
    "q_chat_turn_stats" -> chatTurnStats _,
    "q_chat_pack"       -> chatPack _,
    "q_pref_pairs"      -> prefPairs _,
    "q_pref_stats"      -> prefStats _,
    "q_pref_kappa"      -> prefKappa _,
    "q_dpo_render"      -> dpoRender _)

  /** Shared oracle CTEs: the planted per-turn table (doc_id, t, role,
    * content, n_content) rebuilt from the SAME token arithmetic as
    * [[chatDocs]] — never by reading the conversation column. The
    * faulted role of turn 2 is turn 1's base role, which is `user`
    * exactly on system docs (k = 0) and `assistant` otherwise. */
  private val turnsCte: String =
    s"""tok AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |base AS (SELECT doc_id, w, len(w) AS n,
       |    (len(w) + ${TurnToks - 1}) // $TurnToks AS n_turns,
       |    doc_id % $SysMod = 0 AS has_sys
       |  FROM tok WHERE len(w) >= 1),
       |tix AS (SELECT doc_id, w, n, n_turns, has_sys,
       |    unnest(range(n_turns)) AS t FROM base),
       |turns AS (SELECT doc_id, n_turns, has_sys, t,
       |    CASE
       |      WHEN doc_id % $FaultMod = 0 AND n_turns >= 3 AND t = 2 THEN
       |        CASE WHEN has_sys THEN '$RoleUser' ELSE '$RoleAsst' END
       |      WHEN has_sys AND t = 0 THEN '$RoleSys'
       |      WHEN (t - CASE WHEN has_sys THEN 1 ELSE 0 END) % 2 = 0
       |        THEN '$RoleUser'
       |      ELSE '$RoleAsst'
       |    END AS role,
       |    array_to_string(list_slice(w,
       |      t * $TurnToks + 1, t * $TurnToks + $TurnToks), ' ') AS content,
       |    least($TurnToks, n - t * $TurnToks) AS n_content
       |  FROM tix)""".stripMargin

  /** Shared preference-pair CTE: the planted slices rebuilt from the
    * SAME token arithmetic as [[prefDocs]] (DuckDB `list_slice` is
    * inclusive-stop, Spark `slice` is length-based — both land on the
    * identical token runs). Ends in `prefp(pair_id, prompt, chosen,
    * rejected, margin_x100)`. */
  private val prefCte: String =
    s"""prefw AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |prefp AS (SELECT doc_id AS pair_id,
       |    array_to_string(list_slice(w, 1, $PrefPromptToks), ' ')
       |      AS prompt,
       |    array_to_string(list_slice(w, ${PrefPromptToks + 1},
       |      ${PrefPromptToks + 4} + doc_id % 3), ' ') AS chosen,
       |    CASE WHEN doc_id % $PrefFaultMod = 0
       |      THEN array_to_string(list_slice(w, ${PrefPromptToks + 1},
       |        ${PrefPromptToks + 4} + doc_id % 3), ' ')
       |      ELSE array_to_string(list_slice(w,
       |        ${PrefPromptToks + 5} + doc_id % 3,
       |        ${PrefPromptToks + 8} + doc_id % 3 + (doc_id // 3) % 3),
       |        ' ') END AS rejected,
       |    CAST(doc_id % 100 - $PrefMarginShift AS INT) AS margin_x100
       |  FROM prefw WHERE len(w) >= $PrefMinToks),
       |prefq AS (SELECT pair_id, prompt, chosen, rejected, margin_x100,
       |    CAST(len(list_filter(string_split(chosen, ' '),
       |      x -> x <> '')) AS INT) AS n_chosen_toks,
       |    CAST(len(list_filter(string_split(rejected, ' '),
       |      x -> x <> '')) AS INT) AS n_rejected_toks,
       |    chosen = rejected AS degenerate,
       |    chosen <> rejected AND margin_x100 > 0 AS admitted
       |  FROM prefp)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pref_pairs" ->
      s"""WITH $prefCte
         |SELECT pair_id, n_chosen_toks, n_rejected_toks, degenerate,
         |  margin_x100,
         |  md5(prompt || ' ' || chosen || ' ' || rejected) AS pair_fp,
         |  admitted
         |FROM prefq""".stripMargin,
    "q_pref_stats" ->
      s"""WITH $prefCte
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN degenerate THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_degenerate,
         |  CAST(sum(CASE WHEN NOT degenerate AND margin_x100 < 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_inverted,
         |  CAST(sum(CASE WHEN NOT degenerate AND margin_x100 = 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_tied,
         |  CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_admitted,
         |  CAST(sum(CASE WHEN admitted AND n_chosen_toks > n_rejected_toks
         |      THEN 1 ELSE 0 END) * 100
         |    // sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS INT)
         |    AS chosen_longer_pct,
         |  CAST(sum(CASE WHEN admitted THEN margin_x100 ELSE 0 END)
         |    // sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS INT)
         |    AS avg_margin_x100
         |FROM prefq""".stripMargin,
    "q_pref_kappa" ->
      s"""WITH $prefCte,
         |kl AS (SELECT pair_id, margin_x100 > 0 AS label_a,
         |    CAST('0x' || substr(md5(CAST(pair_id AS VARCHAR)), 1, 4)
         |      AS BIGINT) % $KappaFlipMod = 0 AS flip
         |  FROM prefq WHERE NOT degenerate),
         |kb AS (SELECT pair_id, label_a,
         |    (label_a AND NOT flip) OR (NOT label_a AND flip) AS label_b
         |  FROM kl),
         |ka AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |    CAST(sum(CASE WHEN label_a = label_b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_agree,
         |    CAST(sum(CASE WHEN label_a THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a_pos,
         |    CAST(sum(CASE WHEN label_b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS b_pos
         |  FROM kb),
         |km AS (SELECT *,
         |    a_pos * b_pos + (n_items - a_pos) * (n_items - b_pos)
         |      AS chance_m
         |  FROM ka)
         |SELECT n_items, n_agree,
         |  CAST(n_agree * 1000000 // n_items AS BIGINT) AS po_ppm,
         |  CAST(chance_m * 1000000 // (n_items * n_items) AS BIGINT)
         |    AS pe_ppm,
         |  CAST(CASE WHEN n_agree * n_items > chance_m
         |    THEN (n_agree * n_items - chance_m) * 1000000
         |         // (n_items * n_items - chance_m)
         |    ELSE 0 END AS BIGINT) AS kappa_ppm
         |FROM km""".stripMargin,
    "q_dpo_render" ->
      s"""WITH $prefCte
         |SELECT pair_id,
         |  md5('<|im_start|>user' || chr(10) || prompt || '<|im_end|>'
         |    || chr(10) || '<|im_start|>assistant' || chr(10) || chosen
         |    || '<|im_end|>' || chr(10)) AS chosen_fp,
         |  md5('<|im_start|>user' || chr(10) || prompt || '<|im_end|>'
         |    || chr(10) || '<|im_start|>assistant' || chr(10) || rejected
         |    || '<|im_end|>' || chr(10)) AS rejected_fp,
         |  CAST(n_chosen_toks + $LossExtraToks AS INT) AS n_loss_chosen,
         |  CAST(n_rejected_toks + $LossExtraToks AS INT)
         |    AS n_loss_rejected,
         |  CAST($PrefPromptToks + n_chosen_toks
         |    + ${2 * TurnOverheadToks} AS INT) AS n_tok_chosen_branch
         |FROM prefq WHERE admitted""".stripMargin,
    // exact rendered bytes rebuilt per turn and string_agg'd in turn
    // order; md5 grades the full render without shipping it
    "q_chat_render" ->
      s"""WITH $turnsCte,
         |r AS (SELECT doc_id,
         |    CAST(max(n_turns) AS INT) AS n_turns,
         |    string_agg('<|im_start|>' || role || chr(10) || content ||
         |      '<|im_end|>' || chr(10), '' ORDER BY t) AS rendered
         |  FROM turns GROUP BY doc_id)
         |SELECT doc_id, n_turns,
         |  CAST(length(rendered) AS INT) AS n_chars,
         |  md5(rendered) AS render_fp
         |FROM r""".stripMargin,
    // the validator's booleans from the planted role table: adjacency
    // via lead() over the system-stripped sequence, ends via max_by
    "q_chat_validate" ->
      s"""WITH $turnsCte,
         |nonsys AS (SELECT doc_id, t, role,
         |    lead(role) OVER (PARTITION BY doc_id ORDER BY t) AS nxt,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY t) AS rk
         |  FROM turns WHERE role <> '$RoleSys'),
         |alt AS (SELECT doc_id,
         |    bool_and(nxt IS NULL OR role <> nxt) AS alternates,
         |    bool_or(rk = 1 AND role = '$RoleUser') AS starts_user
         |  FROM nonsys GROUP BY doc_id),
         |agg AS (SELECT doc_id,
         |    CAST(max(n_turns) AS INT) AS n_turns,
         |    bool_or(t = 0 AND role = '$RoleSys') AS has_system,
         |    NOT bool_or(t > 0 AND role = '$RoleSys') AS sys_only_first,
         |    max_by(role, t) = '$RoleAsst' AS ends_assistant
         |  FROM turns GROUP BY doc_id)
         |SELECT a.doc_id, a.n_turns, a.has_system, a.sys_only_first,
         |  coalesce(l.starts_user, FALSE) AS starts_user,
         |  coalesce(l.alternates, TRUE) AS alternates,
         |  a.ends_assistant,
         |  a.sys_only_first AND coalesce(l.starts_user, FALSE)
         |    AND coalesce(l.alternates, TRUE) AND a.ends_assistant AS valid
         |FROM agg a LEFT JOIN alt l USING (doc_id)""".stripMargin,
    // token accounting: content counts from the planted arithmetic,
    // overhead/loss constants shared with the Scala side
    "q_loss_mask" ->
      s"""WITH $turnsCte,
         |m AS (SELECT doc_id,
         |    CAST(max(n_turns) AS INT) AS n_turns,
         |    CAST(sum(n_content + $TurnOverheadToks) AS BIGINT)
         |      AS n_tok_total,
         |    CAST(sum(CASE WHEN role = '$RoleAsst'
         |      THEN n_content + $LossExtraToks ELSE 0 END) AS BIGINT)
         |      AS n_tok_loss
         |  FROM turns GROUP BY doc_id)
         |SELECT doc_id, n_turns, n_tok_total, n_tok_loss,
         |  CAST(n_tok_loss * 100 // n_tok_total AS INT) AS loss_pct
         |FROM m""".stripMargin,
    // the packing window recomputed verbatim (the q_seq_pack oracle
    // shape) over the per-conversation render totals
    "q_chat_pack" ->
      s"""WITH $turnsCte,
         |ctok AS (SELECT doc_id,
         |    CAST(sum(n_content + $TurnOverheadToks) AS BIGINT) AS tok
         |  FROM turns GROUP BY doc_id),
         |d AS (SELECT c.doc_id, doc.lang, c.tok,
         |    CAST(c.doc_id % ${CurationOps.PackShards} AS INT) AS shard
         |  FROM ctok c JOIN documents doc USING (doc_id)),
         |cm AS (SELECT *, sum(tok) OVER (PARTITION BY lang, shard
         |    ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |b AS (SELECT lang, shard,
         |    (cum - tok) // ${CurationOps.PackBudget} AS seq_id,
         |    count(*) AS n_convs, CAST(sum(tok) AS BIGINT) AS n_tok
         |  FROM cm GROUP BY 1, 2, 3)
         |SELECT lang, count(*) AS n_seqs,
         |  CAST(sum(n_convs) AS BIGINT) AS n_convs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  max(n_tok) AS max_seq_tokens
         |FROM b GROUP BY lang""".stripMargin,
    "q_chat_turn_stats" ->
      s"""WITH $turnsCte
         |SELECT role,
         |  CAST(count(*) AS BIGINT) AS n_turns,
         |  CAST(sum(n_content) AS BIGINT) AS tot_toks,
         |  CAST(sum(n_content) * 100 // count(*) AS BIGINT)
         |    AS avg_toks_x100
         |FROM turns GROUP BY role""".stripMargin)
}
