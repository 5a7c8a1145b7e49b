package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.EncodingRepair

/** [[graft.plans.EncodingRepair]] — sloppy-cp1252 mojibake unwind.
  * The oracled row is q_encoding_repair (fixture mangles and repairs
  * both hash-checked against DuckDB chr()-assembled strings); this
  * pins the kernel's refusal edges on hostile input — the cases where
  * firing would CORRUPT clean text. */
class EncodingRepairSpec extends SparkSpec {

  private def fix(s: String): String =
    EncodingRepair.fix(UTF8String.fromString(s)).toString

  test("planted mangles unwind to the clean text, single and double") {
    import graft.operators.TextOps
    assert(fix(TextOps.MojiOnce) == TextOps.MojiClean)
    assert(fix(TextOps.MojiTwice) == TextOps.MojiClean)
    // idempotent: a repaired string has nothing left to unwind
    assert(fix(fix(TextOps.MojiTwice)) == TextOps.MojiClean)
  }

  test("ascii is returned untouched (fast path, same instance)") {
    val in = UTF8String.fromString("plain ascii text, no repair")
    assert(EncodingRepair.fix(in) eq in)
  }

  test("genuinely clean accented text is refused, not corrupted") {
    // cp1252-encode of these is NOT valid UTF-8 (stray continuation /
    // truncated lead), so the round-trip must refuse
    for (s <- Seq(" café ", "naïve", "€50",
        "AÃ", "Á¿ end")) // truncated lead; C1 overlong
      assert(fix(s) == s, s"kernel corrupted clean text: <$s>")
  }

  test("chars outside the sloppy-cp1252 image refuse the whole string") {
    // CJK cannot be a cp1252 rendering of anything — even when the
    // rest of the string looks mangled, firing would drop the CJK
    val s = "中文 cafÃ©"
    assert(fix(s) == s)
    // a bare C1 control the table does NOT claim (0x85 renders as
    // \u2026 in cp1252, so U+0085 is outside the sloppy image)
    assert(fix("x\u0085y") == "x\u0085y")
  }

  test("mid-string mojibake repairs without touching the ascii around") {
    assert(fix("price cafÃ© done") == "price café done")
    // euro through the 0x80-0x9F table: â‚¬ → €
    assert(fix("â‚¬ 99") == "€ 99")
  }

  test("surrogate-range and overlong byte shapes are rejected") {
    // \u00ed + NBSP + NBSP encodes to ED A0 A0 — structurally plausible
    // UTF-8 that decodes to the surrogate U+D820: must refuse
    val s = "\u00ed\u00a0\u00a0"
    assert(fix(s) == s, "surrogate encodings must refuse")
    // \u00e0 + NBSP encodes to E0 A0 — a truncated 3-byte lead
    val o = "\u00e0\u00a0"
    assert(fix(o) == o)
  }

  test("null flows through the expression null-safe") {
    import spark.implicits._
    val fixf = EncodingRepair.fixCol(spark) _
    val out = Seq(Option("a cafÃ©"), None).toDF("t")
      .select(fixf(col("t")).as("f")).collect()
    assert(out(0).getString(0) == "a café")
    assert(out(1).isNullAt(0))
  }

  test("repair stays inside whole-stage codegen") {
    val fixf = EncodingRepair.fixCol(spark) _
    val df = spark.range(10).select(fixf(concat(lit("x"),
      col("id").cast("string"))).as("f"))
    df.queryExecution.toRdd.count()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "FixMojibake must not break the codegen span")
  }

  test("fixture contract: the 40-char corpus prefix is pure ASCII at every gate SF") {
    // The q_encoding_repair / q_clean_pipeline oracles hard-code
    // repaired = (doc_id % 3) < 2, which holds ONLY while every doc's
    // 40-char prefix is ASCII — one non-ASCII prefix char makes the
    // whole-string round-trip refuse and the Spark result diverge
    // from the oracle as an opaque hash mismatch (ADVICE r16). Pin
    // the contract here so a corpus regeneration fails with THIS
    // message instead.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val bad = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .where(!substring(col("text"), 1, 40).rlike("^[\\x00-\\x7F]*$"))
        .count()
      assert(bad == 0L,
        s"$sf: $bad documents carry a non-ASCII 40-char prefix — " +
          "the encoding-repair fixture oracles assume ASCII prefixes")
    }
  }
}
