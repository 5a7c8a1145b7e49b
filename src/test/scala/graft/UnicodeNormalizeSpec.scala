package graft

import graft.plans.{NfcNormalize, StripAccents, UnicodeNormalize}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The codegen'd Unicode-normalization expressions: kernel semantics
  * (NFC composition, accent stripping), fast paths, null handling, and
  * interpreted ≡ codegen. Cross-engine byte agreement with DuckDB's
  * nfc_normalize/strip_accents is pinned by the q_unicode_norm /
  * q_norm_dedup oracles. */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nfc = UnicodeNormalize.nfcCol(spark) _
  private lazy val strip = UnicodeNormalize.stripAccentsCol(spark) _

  private val decomposed = "café français nuñez"
  private val composed = "café français nuñez"

  test("nfc composes decomposed forms; composed and ascii pass through") {
    val df = Seq(decomposed, composed, "plain ascii", "")
      .toDF("s").select(col("s"), nfc(col("s")).as("n"))
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows(decomposed) == composed, "NFD input must compose")
    assert(rows(composed) == composed)
    assert(rows("plain ascii") == "plain ascii")
    assert(rows("") == "")
  }

  test("strip_accents: both forms collapse to the same ascii; " +
      "ligatures and symbols survive (NFD does not decompose them)") {
    val df = Seq(decomposed, composed, "plain", "æ ø €")
      .toDF("s").select(col("s"), strip(col("s")).as("n"))
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows(decomposed) == "cafe francais nunez")
    assert(rows(composed) == "cafe francais nunez")
    assert(rows("plain") == "plain")
    assert(rows("æ ø €") == "æ ø €",
      "ae-ligature, slashed-o, euro sign carry no combining marks")
  }

  test("null propagates; kernels are identity on already-clean input") {
    val withNull = Seq((1, null: String)).toDF("i", "s")
    assert(withNull.select(nfc(col("s"))).head().isNullAt(0))
    assert(withNull.select(strip(col("s"))).head().isNullAt(0))
    // fast paths return the SAME UTF8String instance (no allocation)
    val s = UTF8String.fromString("already normalized ascii")
    assert(UnicodeNormalize.nfc(s) eq s)
    assert(UnicodeNormalize.stripAccents(s) eq s)
  }

  test("interpreted eval matches the codegen'd dataframe path") {
    val viaDf = Seq(decomposed).toDF("s")
      .select(nfc(col("s")), strip(col("s"))).head()
    assert(NfcNormalize(Literal(decomposed)).eval(null).toString
      == viaDf.getString(0))
    assert(StripAccents(Literal(decomposed)).eval(null).toString
      == viaDf.getString(1))
  }

  test("SQL surface: callable from spark.sql after registration") {
    nfc(col("x")); strip(col("x")) // ensure registered
    val got = spark.sql(
      s"SELECT graft_nfc('café') AS a, " +
        s"graft_strip_accents('café') AS b").head()
    assert(got.getString(0) == "café" && got.getString(1) == "cafe")
  }

  test("normalization stays inside whole-stage codegen (no fallback)") {
    // a literal-only local relation constant-folds away; drive the
    // expressions from a range scan so a real projection survives
    val df = spark.range(4)
      .select(concat(lit(decomposed + " "), col("id")).as("s"))
      .select(nfc(col("s")).as("n"), strip(col("s")).as("a"))
    val plan = df.queryExecution.executedPlan
    val codegenSpans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(codegenSpans.nonEmpty,
      s"expected codegen'd projection, got:\n$plan")
    // and the normalize projection is INSIDE a span, not split out
    assert(codegenSpans.exists(_.toString.contains("graft_nfc")),
      s"graft_nfc fell outside whole-stage codegen:\n$plan")
    val vals = df.collect()
    assert(vals.forall(r => r.getString(0).startsWith(composed) &&
      r.getString(1).startsWith("cafe francais nunez")))
  }
}
