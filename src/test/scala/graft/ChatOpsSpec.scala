package graft

import org.apache.spark.sql.functions._
import graft.operators.ChatOps

/** [[graft.operators.ChatOps]] — the SFT/chat-preparation family. The
  * oracled structural checks are q_chat_render/q_chat_validate/
  * q_loss_mask/q_chat_turn_stats; this pins the operator semantics on
  * hand-built conversations (the operators read the conversation
  * column, so they are testable without the corpus fixture) plus the
  * fixture's planted invariants. */
class ChatOpsSpec extends SparkSpec {
  import spark.implicits._

  // hand-built conversations through the same operators the declared
  // queries run: feed a documents-shaped frame whose token arithmetic
  // is easy to reason about
  private def docsOf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("render: exact ChatML framing, turn order preserved") {
    // doc 1 (non-system, non-fault): 10 tokens -> 2 turns:
    //   user: t1..t8, assistant: t9 t10
    val txt = (1 to 10).map(i => s"t$i").mkString(" ")
    val expect = "<|im_start|>user\n" + (1 to 8).map(i => s"t$i")
      .mkString(" ") + "<|im_end|>\n" +
      "<|im_start|>assistant\nt9 t10<|im_end|>\n"
    val got = chatDocsRender(docsOf((1L, txt))).head()
    assert(got.getInt(1) == 2, "two turns")
    assert(got.getInt(2) == expect.length, "rendered length")
    assert(got.getString(3).length == 32, "md5 hex fp")
  }

  // render pipeline over an arbitrary documents-shaped frame (the same
  // expressions chatRender composes, minus the table load)
  private def chatDocsRender(docs: org.apache.spark.sql.DataFrame) = {
    val conv = invokeChatDocs(docs)
    conv.withColumn("rendered", array_join(transform(col("conv"), c =>
        concat(lit("<|im_start|>"), c.getField("role"), lit("\n"),
          c.getField("content"), lit("<|im_end|>\n"))), ""))
      .select(col("doc_id"), size(col("conv")).as("n_turns"),
        length(col("rendered")).cast("int").as("n_chars"),
        md5(col("rendered").cast("binary")).as("render_fp"))
  }

  private def invokeChatDocs(docs: org.apache.spark.sql.DataFrame) =
    ChatOps.chatDocs(docs)

  test("fixture: system turn on SysMod docs, fault on FaultMod docs") {
    val txt = (1 to 25).map(i => s"x$i").mkString(" ") // 25 toks -> 4 turns
    val conv = invokeChatDocs(docsOf((3L, txt), (7L, txt), (2L, txt)))
      .select(col("doc_id"),
        transform(col("conv"), c => c.getField("role")).as("roles"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // doc 3: system doc (3 % 3 == 0), no fault
    assert(conv(3L) == Seq("system", "user", "assistant", "user"))
    // doc 7: fault doc — turn 2 takes turn 1's base role (assistant)
    assert(conv(7L) == Seq("user", "assistant", "assistant", "assistant"))
    // doc 2: plain alternation
    assert(conv(2L) == Seq("user", "assistant", "user", "assistant"))
  }

  test("validator: every boolean fires on the planted corpus") {
    val v = ChatOps.chatValidate(spark, sfDir)
    val agg = v.agg(
      sum(when(col("valid"), 1).otherwise(0)).as("n_valid"),
      sum(when(!col("alternates"), 1).otherwise(0)).as("n_broken_alt"),
      sum(when(col("has_system"), 1).otherwise(0)).as("n_sys"),
      sum(when(!col("ends_assistant"), 1).otherwise(0)).as("n_bad_end"),
      count(lit(1)).as("n")).head()
    assert(agg.getLong(0) > 0, "some conversations are valid")
    assert(agg.getLong(1) > 0, "FaultMod plants alternation breaks")
    assert(agg.getLong(2) > 0, "SysMod plants system turns")
    assert(agg.getLong(3) > 0, "parity plants trailing-user endings")
    assert(agg.getLong(0) < agg.getLong(4), "not everything valid")
    // a broken alternation can never be valid
    assert(v.where(!col("alternates") && col("valid")).isEmpty)
  }

  test("loss mask: totals and mask density on a known conversation") {
    // doc 2 (plain): 25 toks -> turns 8/8/8/1, roles u/a/u/a
    val txt = (1 to 25).map(i => s"x$i").mkString(" ")
    val conv = invokeChatDocs(docsOf((2L, txt)))
    val row = conv.select(col("doc_id"), size(col("conv")).as("n_turns"),
        aggregate(col("conv"), lit(0L), (acc, c) =>
          acc + size(filter(split(c.getField("content"), " "),
            t => t =!= "")).cast("long") + ChatOps.TurnOverheadToks)
          .as("n_tok_total"),
        aggregate(col("conv"), lit(0L), (acc, c) =>
          acc + when(c.getField("role") === "assistant",
            size(filter(split(c.getField("content"), " "),
              t => t =!= "")).cast("long") + ChatOps.LossExtraToks)
            .otherwise(0L)).as("n_tok_loss"))
      .head()
    // total = 25 content + 4*2 overhead = 33
    assert(row.getLong(2) == 33L)
    // assistant turns: 8 + 1 content, +1 im_end each = 11
    assert(row.getLong(3) == 11L)
  }

  test("declared queries: corpus-level invariants hold") {
    val mask = ChatOps.lossMask(spark, sfDir)
    assert(mask.where(col("n_tok_loss") > col("n_tok_total")).isEmpty,
      "loss tokens can never exceed total")
    assert(mask.where(col("loss_pct") < 0 || col("loss_pct") > 100).isEmpty)
    val stats = ChatOps.chatTurnStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.keySet == Set("system", "user", "assistant"))
    // alternation means user turns >= assistant turns - corpus-wide the
    // user side leads every conversation, so it can only be >=
    assert(stats("user") >= stats("assistant"))
    assert(stats("system") < stats("user"), "system is 1-per-SysMod-doc")
  }

  test("preference pairs: the admission gate drops exactly the " +
      "degenerate/tied/inverted classes; stats match the pair relation") {
    val pairs = ChatOps.prefPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val deg = r.getAs[Boolean]("degenerate")
      val m = r.getAs[Int]("margin_x100")
      assert(r.getAs[Boolean]("admitted") == (!deg && m > 0), s"$r")
      // every planted-degenerate pair is content-degenerate (the 'q'
      // fuzzy-twin lesson: the invariant is checked on CONTENT)
      if (r.getAs[Long]("pair_id") % ChatOps.PrefFaultMod == 0)
        assert(deg, s"planted degenerate must surface: $r")
    }
    val st = ChatOps.prefStats(spark, sfDir).head()
    val admitted = pairs.count(_.getAs[Boolean]("admitted"))
    assert(st.getAs[Long]("n_pairs") == pairs.length.toLong)
    assert(st.getAs[Long]("n_admitted") == admitted.toLong)
    assert(st.getAs[Long]("n_degenerate") ==
      pairs.count(_.getAs[Boolean]("degenerate")).toLong)
    // the length-bias audit reads a real mid-range value on the planted
    // lengths (chosen is longer in ~1/3 of admitted pairs by design)
    val pct = st.getAs[Int]("chosen_longer_pct")
    assert(pct > 0 && pct < 100, s"length bias must be measured: $pct")
    // inter-annotator agreement: the md5-coin flip is independent of
    // the label, so kappa sits well above the chance floor (a
    // label-correlated flip collapses it to 0 — the bug this pins) and
    // below the ~(1-2f) agreement ceiling of a 20% symmetric flip
    val kap = ChatOps.prefKappa(spark, sfDir).head()
    assert(kap.getAs[Long]("n_items") ==
      pairs.count(!_.getAs[Boolean]("degenerate")).toLong)
    val kappa = kap.getAs[Long]("kappa_ppm")
    assert(kappa > 150000L && kappa < 700000L,
      s"kappa must show real but imperfect agreement: $kappa")
    assert(kap.getAs[Long]("po_ppm") > kap.getAs[Long]("pe_ppm"))
    // every admitted pair renders two distinct branches
    val dpo = ChatOps.dpoRender(spark, sfDir).collect()
    assert(dpo.length == admitted)
    dpo.foreach { r =>
      assert(r.getAs[String]("chosen_fp") != r.getAs[String]("rejected_fp"),
        s"admitted pairs must render distinct branches: $r")
      assert(r.getAs[Int]("n_loss_chosen") >= 1
        && r.getAs[Int]("n_loss_rejected") >= 1)
    }
  }
}
