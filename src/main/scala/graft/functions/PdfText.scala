package graft.functions

import scala.collection.mutable.ArrayBuffer

/** PDF → text extraction — the other high-frequency document container
  * a real training corpus carries (VERDICT r14 item 6, the
  * [[HtmlText]] sibling). Same discipline as the
  * [[HtmlText]]/[[FitsHeader]]/[[graft.functions.IsoBmff]] kernels: a
  * pure-JVM single-pass walker over untrusted bytes, run as a
  * `Dataset.map` (map-only, no shuffle — at 100 TB the scan
  * parallelizes by input split like every other decode kernel).
  *
  * What it implements (deterministic, oracle-checkable):
  *
  *  - **Stream discovery**: every `stream`…`endstream` section in the
  *    file, located by the keyword grammar (never the xref table — a
  *    torn or lying xref must not hide content; this is also the
  *    standard robust-reader posture). The owning dictionary is the
  *    bounded back-scan to the enclosing `<<`, checked for
  *    `/FlateDecode`.
  *  - **FlateDecode**: `java.util.zip.Inflater` with an output CAP —
  *    a deflate bomb decompresses to at most [[MaxInflate]] bytes and
  *    the walk proceeds on the prefix (never OOM). Other filters
  *    (DCT, LZW, …) are skipped as non-text payload.
  *  - **Text operators**: inside `BT`…`ET`, the show operators `Tj`,
  *    `'`, `"` append their string operand and `TJ` appends every
  *    string element of its array (kerning numbers skipped), in
  *    operator order. Strings outside BT/ET contribute nothing.
  *  - **String syntax**: literal `(…)` strings with balanced nested
  *    parens, the standard escapes `\n \r \t \b \f \( \) \\`, octal
  *    `\ddd`, and backslash line continuation; hex `<…>` strings with
  *    odd-length zero padding. `%` comments skip to end of line
  *    (string parsing consumes `%` inside strings first).
  *  - Show-string bytes are emitted verbatim (ISO-8859-1 ⇒
  *    byte-faithful). Real PDFs map bytes through the font's encoding;
  *    for the ASCII/WinAnsi class — the overwhelming majority of
  *    machine-generated text PDFs — identity is that mapping. A CID /
  *    custom-CMap font would need the font program, which is out of
  *    kernel scope (documented seam, same class as the compressed
  *    video codec seam).
  *
  * Hostile-input posture (spec-pinned): truncated streams walk to EOF,
  * an unterminated string or hex string flushes at end of content, a
  * missing `endstream` bounds at the next `stream` keyword or EOF,
  * output is capped at [[MaxOutChars]], stream count at [[MaxStreams]]
  * — single pass, no backtracking, never throws. */
object PdfText {

  /** Extracted-text cap — a hostile file cannot balloon the row. */
  val MaxOutChars = 1 << 20

  /** Streams walked per file (cap, not a truncation on real docs). */
  val MaxStreams = 1024

  /** Inflate output cap per stream (deflate-bomb guard). */
  val MaxInflate = 1 << 22

  /** One file's extraction: the shown text in operator order, the
    * number of show operators executed, the number of content streams
    * walked, and how many of them were FlateDecode-compressed. */
  final case class PdfExtract(text: String, n_text_ops: Int,
      n_streams: Int, n_flate: Int)

  private val Empty = PdfExtract("", 0, 0, 0)

  /** Total function over untrusted bytes — never throws. */
  def extract(bytes: Array[Byte]): PdfExtract = {
    if (bytes == null || bytes.length == 0) return Empty
    try walk(bytes)
    catch { case _: Throwable => Empty }
  }

  private def walk(bytes: Array[Byte]): PdfExtract = {
    // byte-faithful view for keyword scanning (ISO-8859-1 is a
    // bijection byte <-> char 0..255)
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new java.lang.StringBuilder(256)
    var ops = 0; var streams = 0; var flates = 0
    var i = 0
    while (i >= 0 && streams < MaxStreams) {
      i = s.indexOf("stream", i)
      if (i >= 0) {
        // "endstream" also contains "stream" — require a keyword
        // boundary on the left
        val standalone = i == 0 || !Character.isLetter(s.charAt(i - 1))
        var body = i + "stream".length
        // the spec says CRLF or LF follows the keyword
        if (body < s.length && s.charAt(body) == '\r') body += 1
        if (body < s.length && s.charAt(body) == '\n') body += 1
        if (standalone) {
          val end0 = s.indexOf("endstream", body)
          val next0 = s.indexOf("stream", body)
          val end = if (end0 >= 0) end0
            else if (next0 >= 0) next0 else s.length
          val dict = dictBefore(s, i)
          val raw = java.util.Arrays.copyOfRange(bytes, body, end)
          val isFlate = dict.contains("/FlateDecode")
          val otherFilter = !isFlate && dict.contains("/Filter")
          val content: Array[Byte] =
            if (isFlate) { flates += 1; inflateCapped(raw) }
            else if (otherFilter) Array.emptyByteArray
            else raw
          streams += 1
          ops += walkContent(content, out)
          i = end + 1
        } else i = body
      }
    }
    val text = if (out.length > MaxOutChars)
      out.substring(0, MaxOutChars) else out.toString
    PdfExtract(text, ops, streams, flates)
  }

  /** The dictionary text governing the stream at `kw`: bounded
    * back-scan to the outermost `<<` since the previous `obj` /
    * `endobj` boundary (or [[DictScanBack]] bytes, whichever is
    * nearer). Malformed nesting degrades to "no dict" — the stream
    * then walks raw, which is safe. */
  private val DictScanBack = 4096
  private def dictBefore(s: String, kw: Int): String = {
    val floor = math.max(0, kw - DictScanBack)
    var j = kw - 1
    var depth = 0
    var start = -1
    while (j > floor) {
      if (s.startsWith(">>", j)) { depth += 1; j -= 2 }
      else if (s.startsWith("<<", j)) {
        depth -= 1
        if (depth <= 0) { start = j; j = floor } else j -= 2
      }
      else if (depth == 0 && (s.startsWith("endobj", j) ||
          s.startsWith(" obj", j))) j = floor
      else j -= 1
    }
    if (start >= 0) s.substring(start, kw) else ""
  }

  private def inflateCapped(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream(
        math.min(raw.length * 4 + 64, MaxInflate))
      while (!inf.finished() && !inf.needsInput() &&
          out.size() < MaxInflate) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0,
          math.min(n, MaxInflate - out.size()))
        else if (n == 0 && inf.needsDictionary()) return out.toByteArray
      }
      out.toByteArray
    } catch { case _: Throwable => Array.emptyByteArray }
    finally inf.end()
  }

  /** Tokenize one content stream, appending shown text to `out`;
    * returns the number of show operators executed inside BT/ET. */
  private def walkContent(content: Array[Byte],
      out: java.lang.StringBuilder): Int = {
    val s = new String(content,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val n = s.length
    var i = 0
    var inText = false // between BT and ET
    var ops = 0
    // string operands seen since the LAST operator token — TJ shows
    // all of them (its array), Tj / ' / " the last one
    val pending = ArrayBuffer.empty[String]
    def show(all: Boolean): Unit = {
      if (inText && pending.nonEmpty && out.length < MaxOutChars) {
        if (all) pending.foreach(out.append(_: String))
        else out.append(pending.last)
        ops += 1
      }
      pending.clear()
    }
    while (i < n && out.length <= MaxOutChars) {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, next) = literalString(s, i + 1)
        pending += str; i = next
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') {
        i += 2 // dict open — no strings inside reach shows
      } else if (c == '<') {
        val (str, next) = hexString(s, i + 1)
        pending += str; i = next
      } else if (c == '%') {
        while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '\'' || c == '"') {
        show(all = false); i += 1
      } else if (Character.isLetter(c)) {
        var j = i
        while (j < n && (Character.isLetterOrDigit(s.charAt(j)) ||
            s.charAt(j) == '*')) j += 1
        s.substring(i, j) match {
          case "BT" => inText = true; pending.clear()
          case "ET" => inText = false; pending.clear()
          case "Tj" => show(all = false)
          case "TJ" => show(all = true)
          case _ => pending.clear() // any other operator consumes operands
        }
        i = j
      } else i += 1 // numbers, names, [, ], whitespace, delimiters
    }
    ops
  }

  /** Parse a literal string body starting AFTER '('; returns (decoded,
    * index after the closing ')'). Unterminated → to end of content. */
  private def literalString(s: String, from: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder(32)
    var i = from
    var depth = 1
    val n = s.length
    while (i < n && depth > 0 && sb.length <= MaxOutChars) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\r' => // line continuation (\r or \r\n)
            i += 2; if (i < n && s.charAt(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = i + 1
            while (k < n && k < i + 4 && s.charAt(k) >= '0' &&
                s.charAt(k) <= '7') { v = v * 8 + (s.charAt(k) - '0'); k += 1 }
            sb.append((v & 0xff).toChar); i = k
          case other => sb.append(other); i += 2 // lone \x → x, per spec
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1; if (depth > 0) sb.append(c); i += 1
      } else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  /** Parse a hex string body starting AFTER '<'; returns (decoded,
    * index after '>'). Odd digit count zero-pads, per the spec;
    * non-hex chars are skipped; unterminated → end of content. */
  private def hexString(s: String, from: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder(16)
    var i = from
    var hi = -1
    val n = s.length
    while (i < n && s.charAt(i) != '>' && sb.length <= MaxOutChars) {
      val d = Character.digit(s.charAt(i), 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { sb.append(((hi << 4) | d).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar)
    (sb.toString, if (i < n) i + 1 else i)
  }
}
