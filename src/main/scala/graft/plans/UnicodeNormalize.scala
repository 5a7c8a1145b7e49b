package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as native Catalyst expressions — the
  * missing piece of exact dedup on real web text: a composed `é`
  * (U+00E9) and its decomposed twin `e`+U+0301 are byte-different, so
  * every fingerprint family (md5 content hashes, minhash shingles,
  * winnowing grams) treats visually identical documents as distinct.
  * Pipelines therefore canonicalize BEFORE hashing (CCNet lowercases +
  * strips accents for its dedup keys; OSCAR/BigScience normalize to a
  * canonical form). Spark ships no Unicode-normalization function, and
  * a Scala UDF would break whole-stage codegen in the scan that feeds
  * every fingerprint — exactly the hot path. These are UnaryExpressions
  * with `doGenCode`, staying inside the codegen'd stage (one static
  * method call per row; the JDK's `java.text.Normalizer` is the kernel,
  * with a fast-path that skips allocation entirely for text that is
  * already normalized — the overwhelming majority of real corpora).
  *
  * Cross-engine contract: [[NfcNormalize]] is Unicode NFC, matching
  * DuckDB's `nfc_normalize` (both implement UAX #15). [[StripAccents]]
  * is NFD → drop combining marks (`\p{Mn}`) → NFC, matching DuckDB's
  * `strip_accents` on Latin diacritics (é→e, ç→c, ñ→n, ü→u); ligatures
  * and non-letter symbols pass through unchanged in both engines (NFD
  * does not decompose æ/ø). The oracle for the declared queries runs
  * DuckDB's own implementations over an identically synthesized
  * mixed-form corpus — two independent normalizers must agree byte for
  * byte for the rows to hash-match.
  */
object UnicodeNormalize {
  /** NFC kernel with an is-normalized fast path (no allocation when the
    * input is already composed — `isNormalized` is a scan, not a
    * rewrite). Called from generated code; must stay public. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Strip-accents kernel: NFD, drop combining marks, NFC the rest.
    * ASCII fast path (no mark can appear). Called from generated code.
    *
    * The mark scan walks CODEPOINTS (ADVICE r12): `Character.getType`
    * on a bare `char` never classifies a surrogate half as Mn, so a
    * char-indexed loop silently kept supplementary-plane combining
    * marks (e.g. the U+1D165..U+1D169 musical marks) that DuckDB's
    * utf8proc-backed `strip_accents` removes — a byte-level oracle
    * divergence outside the BMP. `getType(int)` sees the full
    * codepoint, so all Mn marks are dropped identically. */
  def stripAccents(s: UTF8String): UTF8String = {
    // all-ASCII bytes cannot carry diacritics — the common case on
    // machine text; UTF8String knows without decoding
    if (s.isFullAscii) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  val NfcFnName = "graft_nfc"
  val StripFnName = "graft_strip_accents"

  private def register(spark: SparkSession, name: String,
      mk: Expression => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(
        name, exprs => {
          require(exprs.length == 1,
            s"$name requires exactly 1 string argument, got ${exprs.length}")
          mk(exprs.head)
        }, "scala_udf")
  }

  /** Column-level handle for NFC (registers lazily, once per session). */
  def nfcCol(spark: SparkSession)(c: Column): Column = {
    register(spark, NfcFnName, NfcNormalize(_))
    call_function(NfcFnName, c)
  }

  /** Column-level handle for strip-accents. */
  def stripAccentsCol(spark: SparkSession)(c: Column): Column = {
    register(spark, StripFnName, StripAccents(_))
    call_function(StripFnName, c)
  }
}

private[plans] trait NormalizeExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)
}

/** Unicode NFC (UAX #15 canonical composition) — see [[UnicodeNormalize]]. */
case class NfcNormalize(child: Expression) extends NormalizeExpr {
  override def prettyName: String = "graft_nfc"
  override protected def nullSafeEval(v: Any): Any =
    UnicodeNormalize.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeNormalize.nfc($c)")
  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

/** NFD → drop `\p{Mn}` → NFC — see [[UnicodeNormalize]]. */
case class StripAccents(child: Expression) extends NormalizeExpr {
  override def prettyName: String = "graft_strip_accents"
  override protected def nullSafeEval(v: Any): Any =
    UnicodeNormalize.stripAccents(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnicodeNormalize.stripAccents($c)")
  override protected def withNewChildInternal(
      newChild: Expression): StripAccents = copy(child = newChild)
}
