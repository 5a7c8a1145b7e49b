package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair as a native Catalyst expression — the FIRST stage of
  * a text-cleaning pipeline, ahead of even Unicode normalization
  * ([[UnicodeNormalize]]): web crawls and legacy dumps routinely carry
  * UTF-8 text that was at some point DECODED as Windows-1252/Latin-1
  * and re-encoded, so `é` (U+00E9, bytes C3 A9) surfaces as `Ã©` — and
  * a twice-mangled corpus shows `ÃƒÂ©`. Every downstream operator
  * (language ID, quality scores, shingles, fingerprints) then sees
  * garbage bytes. The standard public fix (the `ftfy` approach) is to
  * re-encode the characters through the LEGACY codec and re-decode the
  * bytes as UTF-8, accepting the rewrite only when it round-trips
  * cleanly — generalizing the reference's tolerant parsing posture
  * (`bin/save_DBB_stagein_to_DBB.py:49-56` survives malformed
  * key=value lines rather than failing the file).
  *
  * Codec contract ("sloppy cp1252", the de-facto web behavior): bytes
  * 0x80-0x9F map through the Windows-1252 table, the five bytes that
  * table leaves undefined (81 8D 8F 90 9D) map to their C1 control
  * codepoints — making byte→char a BIJECTION on all 256 bytes, so a
  * mangle is always invertible. The repair encodes each char back to
  * its byte (chars outside the image refuse), and accepts only if the
  * byte string is STRICT UTF-8 (no overlongs, no surrogates, no
  * >U+10FFFF) with at least one non-ASCII byte — plain ASCII and
  * genuinely-clean accented text (`café` → E9 + space is not valid
  * UTF-8) pass through untouched, char-identical. Up to
  * [[EncodingRepair.MaxRounds]] rounds unwind double/triple mangles;
  * the loop stops at the first round that no longer round-trips.
  *
  * Scale shape: a pure per-row kernel riding inside whole-stage
  * codegen (one static call, like [[NfcNormalize]]) — no shuffle, no
  * allocation on the ASCII fast path. The oracle for the declared
  * query plants a constant-suffix corpus whose clean, once-mangled and
  * twice-mangled renderings are INDEPENDENTLY assembled from `chr()`
  * codepoints in DuckDB (computed offline with Python's cp1252 codec,
  * never this kernel), so both the mangle fixtures and the repair are
  * hash-checked against a second implementation.
  */
object EncodingRepair {

  /** Maximum unwind depth: real corpora show single and double
    * encoding; three rounds covers the pathological triple at O(len)
    * extra work only on rows that keep round-tripping. */
  val MaxRounds = 3

  /** Windows-1252 byte→codepoint for 0x80-0x9F (the only range that
    * differs from Latin-1); the five undefined bytes (81 8D 8F 90 9D)
    * keep their C1 control codepoints — the sloppy bijection. */
  private val Cp1252High: Array[Char] = Array(
    0x20ac, 0x0081, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008d, 0x017d, 0x008f,
    0x0090, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, 0x009d, 0x017e, 0x0178)
    .map(_.toChar)

  /** Inverse of the sloppy byte→char map for chars above U+00FF (the
    * 27 Windows-1252 specials); chars below U+0100 encode to their low
    * byte except where a special claims it. */
  private val Cp1252Inv: java.util.HashMap[Char, Byte] = {
    val m = new java.util.HashMap[Char, Byte](64)
    var b = 0x80
    while (b <= 0x9f) {
      m.put(Cp1252High(b - 0x80), b.toByte)
      b += 1
    }
    m
  }

  /** Sloppy-cp1252 encode: the byte the web's legacy decode would have
    * read to show this char, or -1 if the char is outside the image
    * (any codepoint above U+00FF that is not a Windows-1252 special —
    * such a string cannot be mojibake of anything). */
  private def charToByte(c: Char): Int = {
    if (c < 0x80) c
    else if (c <= 0xff) {
      // 0x80-0x9F codepoints only round-trip for the five undefined
      // bytes; the rest of Latin-1 maps identity
      if (c >= 0x80 && c <= 0x9f && Cp1252High(c - 0x80) != c) -1
      else c
    } else if (Cp1252Inv.containsKey(c)) Cp1252Inv.get(c) & 0xff
    else -1
  }

  /** Strict UTF-8 validation over `bytes`: rejects overlong forms,
    * surrogates and > U+10FFFF; returns true only if some byte is
    * non-ASCII (an all-ASCII result means the "repair" would be the
    * identity — not a mojibake signature). */
  private def isMojibakeUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    var high = false
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) i += 1
      else {
        high = true
        val (len, min) =
          if (b >= 0xc2 && b <= 0xdf) (2, 0x80)
          else if (b >= 0xe0 && b <= 0xef) (3, 0x800)
          else if (b >= 0xf0 && b <= 0xf4) (4, 0x10000)
          else return false // C0/C1 overlong lead or stray continuation
        if (i + len > n) return false
        var cp = b & (0x3f >> (len - 1))
        var j = 1
        while (j < len) {
          val c = bytes(i + j) & 0xff
          if (c < 0x80 || c > 0xbf) return false
          cp = (cp << 6) | (c & 0x3f)
          j += 1
        }
        if (cp < min || cp > 0x10ffff ||
          (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += len
      }
    }
    high
  }

  /** One unwind round: sloppy-cp1252 encode + strict UTF-8 re-decode,
    * or null when the string does not round-trip (not mojibake). */
  private def unwind(s: String): String = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = charToByte(s.charAt(i))
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    if (!isMojibakeUtf8(out)) null
    else new String(out, StandardCharsets.UTF_8)
  }

  /** Repair kernel — called from generated code; must stay public.
    * ASCII fast path: no byte ≥ 0x80 means nothing to unwind. */
  def fix(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    var cur = s.toString
    var rounds = 0
    var next = unwind(cur)
    while (next != null && rounds < MaxRounds) {
      cur = next
      rounds += 1
      next = if (rounds < MaxRounds) unwind(cur) else null
    }
    if (rounds == 0) s else UTF8String.fromString(cur)
  }

  val FnName = "graft_fix_mojibake"

  /** Column-level handle (registers lazily, once per session). */
  def fixCol(spark: SparkSession)(c: Column): Column = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(
        FnName, exprs => {
          require(exprs.length == 1,
            s"$FnName requires exactly 1 string argument, got " +
              s"${exprs.length}")
          FixMojibake(exprs.head)
        }, "scala_udf")
    call_function(FnName, c)
  }
}

/** Sloppy-cp1252 mojibake unwind (≤3 rounds) — see [[EncodingRepair]]. */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)
  override def prettyName: String = "graft_fix_mojibake"
  override protected def nullSafeEval(v: Any): Any =
    EncodingRepair.fix(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.EncodingRepair.fix($c)")
  override protected def withNewChildInternal(
      newChild: Expression): FixMojibake = copy(child = newChild)
}
