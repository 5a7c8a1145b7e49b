package graft.functions

import scala.collection.mutable.ArrayBuffer

/** WARC container → record splitter (VERDICT r16 item 4) — the step
  * immediately UPSTREAM of [[HtmlText]] in every real web-corpus
  * pipeline: crawl data arrives as WARC files (ISO 28500 — version
  * line, header block, Content-Length-delimited payload, CRLF CRLF
  * separator; `.warc.gz` is a concatenation of gzip members). Same
  * kernel discipline as [[PdfText]]/[[HtmlText]]/[[FitsHeader]]: a
  * pure-JVM single-pass walker over untrusted bytes, run as a
  * `Dataset.map` over `binaryFile` rows (map-only, no shuffle — at
  * 100 TB the scan parallelizes by file like every other decode
  * kernel; WARC files are conventionally ~1 GB, one task each).
  *
  * What it implements (deterministic, oracle-checkable):
  *
  *  - **Gzip transparency**: a leading gzip magic (1f 8b) gunzips the
  *    whole stream first — `GZIPInputStream` reads concatenated
  *    members natively, so per-record-member files (the CommonCrawl
  *    convention) and whole-file gzip both split identically to their
  *    uncompressed form. Output is capped at [[MaxInflate]] (bomb
  *    guard — the walk proceeds on the prefix).
  *  - **Record walk**: records begin at a `WARC/` version line at
  *    line start; headers are `Name: value` lines up to the first
  *    empty line (names case-insensitive per the spec); the payload
  *    is exactly `Content-Length` octets; the `CRLF CRLF` separator
  *    is then skipped. Parsed per record: WARC-Type (lowercased),
  *    WARC-Target-URI, Content-Type, Content-Length, payload bytes
  *    (capped at [[MaxPayload]]).
  *  - **HTTP unwrap** ([[httpBody]]): a `response` record's payload is
  *    an HTTP message; the body starts after the first blank line and
  *    the status code is the integer after the first space of the
  *    status line — the hand-off [[HtmlText]] consumes.
  *
  * Hostile-input posture (spec-pinned): a payload shorter than its
  * declared Content-Length walks to EOF and flags `truncated`; a
  * missing or non-numeric Content-Length scans forward to the next
  * `WARC/` line-start boundary (payload = the scanned span, flagged
  * `truncated` — the record is surfaced, never silently dropped);
  * garbage before the first version line is skipped; record count is
  * capped at [[MaxRecords]]; total function — never throws. */
object WarcRecords {

  /** Records walked per file. Real CommonCrawl WARCs carry ~100k
    * records per ~1 GB file, so the cap sits above that; a file that
    * still hits it surfaces the loss through [[splitCapped]]'s flag
    * (and `cap_hit` in the directory scan) rather than silently
    * shortening downstream dedup classes and pair counts. */
  val MaxRecords = 1 << 18

  /** Per-record payload bytes retained (hostile-length guard). */
  val MaxPayload = 1 << 22

  /** Whole-file gunzip output cap (gzip-bomb guard). */
  val MaxInflate = 1 << 26

  /** One record: stream offset of its version line (post-gunzip),
    * lowercased WARC-Type ("" if absent), target URI, content type,
    * the declared WARC-Payload-Digest ("" if absent — the header a
    * crawl-level dedup keys on), WARC-Record-ID and
    * WARC-Concurrent-To (angle brackets stripped; "" if absent — the
    * pair of headers request↔response pairing joins on), declared
    * Content-Length (-1 if missing/invalid), the payload bytes
    * actually present (≤ [[MaxPayload]]), and whether the payload is
    * incomplete (short file, bad length, or cap hit). */
  final case class WarcRecord(offset: Long, warcType: String,
      targetUri: String, contentType: String, payloadDigest: String,
      recordId: String, concurrentTo: String, refersTo: String,
      declaredLength: Long, payload: Array[Byte], truncated: Boolean)

  /** Total function over untrusted bytes — never throws. */
  def split(bytes: Array[Byte]): Seq[WarcRecord] = splitCapped(bytes)._1

  /** [[split]] plus a cap-hit flag: true when the walk stopped at
    * [[MaxRecords]] with more record boundaries remaining — the signal
    * directory-scale ingest needs to detect (and quarantine) a file
    * whose tail was not walked, instead of under-counting silently. */
  def splitCapped(bytes: Array[Byte]): (Seq[WarcRecord], Boolean) = {
    if (bytes == null || bytes.length == 0) return (Nil, false)
    try {
      val raw =
        if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
            (bytes(1) & 0xff) == 0x8b) gunzipCapped(bytes)
        else bytes
      walk(raw)
    } catch { case _: Throwable => (Nil, false) }
  }

  private def gunzipCapped(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // Long math: `bytes.length * 4 + 64` overflows Int past ~512 MB
    // input (the conventional ~1 GB .warc.gz), which would throw in
    // the constructor and silently zero out the whole file.
    val out = new java.io.ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4 + 64, MaxInflate.toLong).toInt)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0 && out.size() < MaxInflate) {
        out.write(buf, 0, math.min(n, MaxInflate - out.size()))
        n = in.read(buf)
      }
      out.toByteArray
    } catch {
      // a torn/corrupt member still yields everything read so far —
      // `out` lives outside the try so prior members are kept
      case _: java.io.IOException => out.toByteArray
    } finally in.close()
  }

  private def walk(bytes: Array[Byte]): (Seq[WarcRecord], Boolean) = {
    // byte-faithful view for scanning (ISO-8859-1: byte <-> char)
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer.empty[WarcRecord]
    var i = nextVersionLine(s, 0)
    while (i >= 0 && out.size < MaxRecords) {
      val eol = lineEnd(s, i)
      // headers: Name: value lines up to the first empty line
      var j = skipEol(s, eol)
      var warcType = ""; var uri = ""; var ctype = ""; var digest = ""
      var recId = ""; var concTo = ""; var refTo = ""
      var declared = -1L
      var headersDone = false
      while (!headersDone && j < s.length) {
        val he = lineEnd(s, j)
        if (he == j) { headersDone = true; j = skipEol(s, he) }
        else {
          val line = s.substring(j, he)
          val colon = line.indexOf(':')
          if (colon > 0) {
            val name = line.substring(0, colon).trim.toLowerCase
            val value = line.substring(colon + 1).trim
            name match {
              case "warc-type" => warcType = value.toLowerCase
              case "warc-target-uri" => uri = value
              case "warc-payload-digest" => digest = value
              case "warc-record-id" => recId = stripAngles(value)
              case "warc-concurrent-to" => concTo = stripAngles(value)
              case "warc-refers-to" => refTo = stripAngles(value)
              case "content-type" => ctype = value
              case "content-length" =>
                declared = try {
                  val v = java.lang.Long.parseLong(value)
                  if (v >= 0) v else -1L
                } catch { case _: NumberFormatException => -1L }
              case _ => ()
            }
          }
          j = skipEol(s, he)
        }
      }
      val bodyStart = j
      if (declared >= 0) {
        val avail = s.length - bodyStart
        val take = math.min(math.min(declared, avail.toLong),
          MaxPayload.toLong).toInt
        out += WarcRecord(i.toLong, warcType, uri, ctype, digest,
          recId, concTo, refTo, declared,
          java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + take),
          truncated = avail < declared || declared > MaxPayload)
        // skip the CRLF CRLF separator; a malformed tail just rescans
        val after = bodyStart + math.min(declared, avail.toLong).toInt
        i = nextVersionLine(s, after)
      } else {
        // missing/invalid length: the payload is the span up to the
        // next version line (or EOF) — surfaced, flagged, never dropped
        val next = nextVersionLine(s, bodyStart)
        val end = if (next >= 0) next else s.length
        val take = math.min(end - bodyStart, MaxPayload)
        out += WarcRecord(i.toLong, warcType, uri, ctype, digest,
          recId, concTo, refTo, -1L,
          java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + take),
          truncated = true)
        i = next
      }
    }
    (out.toSeq, i >= 0 && out.size >= MaxRecords)
  }

  /** Record ids conventionally render as `<urn:uuid:…>` — strip the
    * angle brackets so ids and `WARC-Concurrent-To` references compare
    * equal whether or not a writer bracketed them. */
  private def stripAngles(v: String): String =
    if (v.length >= 2 && v.charAt(0) == '<' &&
        v.charAt(v.length - 1) == '>') v.substring(1, v.length - 1)
    else v

  /** Index of the next `WARC/` at line start, at or after `from`. */
  private def nextVersionLine(s: String, from: Int): Int = {
    var i = s.indexOf("WARC/", math.max(from, 0))
    while (i > 0 && s.charAt(i - 1) != '\n')
      i = s.indexOf("WARC/", i + 1)
    i
  }

  private def lineEnd(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i) != '\r' && s.charAt(i) != '\n') i += 1
    i
  }

  private def skipEol(s: String, i: Int): Int =
    if (i < s.length && s.charAt(i) == '\r')
      if (i + 1 < s.length && s.charAt(i + 1) == '\n') i + 2 else i + 1
    else if (i < s.length && s.charAt(i) == '\n') i + 1
    else i

  /** Verify a record's declared payload digest against the bytes
    * actually present: `None` when there is nothing to check (no
    * digest header, unknown algorithm, or a truncated payload — a
    * short read is a transfer problem, not a corruption verdict);
    * `Some(matches)` otherwise. Accepts the `algo:value` convention
    * with md5/sha1/sha256 in hex, plus sha1 in RFC-4648 base32 — the
    * CommonCrawl convention (`sha1:<32 base32 chars>`). A dedup that
    * trusts the header skips this; an ingest that re-verifies calls it
    * per kept record (one digest pass over bytes already in hand). */
  def verifyDigest(r: WarcRecord): Option[Boolean] =
    if (r == null) None
    else verifyDigest(r.payloadDigest, r.payload, r.truncated)

  /** Column-shaped overload of [[verifyDigest]] — the form a relation
    * of already-split records (payload_digest, payload, truncated)
    * feeds without rebuilding [[WarcRecord]]s. */
  def verifyDigest(payloadDigest: String, payload: Array[Byte],
      truncated: Boolean): Option[Boolean] = {
    if (payloadDigest == null || payloadDigest.isEmpty || truncated)
      return None
    val colon = payloadDigest.indexOf(':')
    if (colon <= 0) return None
    val algo = payloadDigest.substring(0, colon).toLowerCase match {
      case "md5" => "MD5"
      case "sha1" => "SHA-1"
      case "sha256" => "SHA-256"
      case _ => return None
    }
    val declared = payloadDigest.substring(colon + 1)
    val dg = try java.security.MessageDigest.getInstance(algo)
      .digest(if (payload == null) Array.emptyByteArray else payload)
    catch { case _: Throwable => return None }
    val hex = dg.map("%02x".format(_)).mkString
    if (declared.equalsIgnoreCase(hex)) Some(true)
    else if (algo == "SHA-1" && declared.length == 32)
      Some(declared.equalsIgnoreCase(base32(dg)))
    else Some(false)
  }

  /** RFC-4648 base32 (no padding needed: 20 sha1 bytes → 32 chars). */
  private def base32(bytes: Array[Byte]): String = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new java.lang.StringBuilder((bytes.length * 8 + 4) / 5)
    var buf = 0L; var nbits = 0
    bytes.foreach { b =>
      buf = (buf << 8) | (b & 0xffL); nbits += 8
      while (nbits >= 5) {
        nbits -= 5
        sb.append(alpha(((buf >> nbits) & 31L).toInt))
      }
    }
    if (nbits > 0) sb.append(alpha(((buf << (5 - nbits)) & 31L).toInt))
    sb.toString
  }

  /** The charset declared in an HTTP payload's `Content-Type` header
    * (lowercased, quotes stripped), or "" when the payload is not
    * HTTP, carries no Content-Type, or declares no `charset=`
    * parameter. A real crawl carries charset-declared bodies; decoding
    * everything as UTF-8 garbles every cp1252/latin-1 page (the
    * mojibake the EncodingRepair family exists to undo downstream —
    * honoring the declaration avoids MAKING it at ingest). */
  def httpCharset(payload: Array[Byte]): String = {
    if (payload == null || payload.length == 0) return ""
    val s = new String(payload,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("HTTP/")) return ""
    // head section only: never read a charset out of the body
    val sep = s.indexOf("\r\n\r\n")
    val sepLf = s.indexOf("\n\n")
    val headEnd =
      if (sep >= 0 && (sepLf < 0 || sep <= sepLf)) sep
      else if (sepLf >= 0) sepLf
      else s.length
    var i = 0
    while (i < headEnd) {
      val eol = lineEnd(s, i)
      val line = s.substring(i, math.min(eol, headEnd))
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim.equalsIgnoreCase("content-type")) {
        val v = line.substring(colon + 1).toLowerCase
        val at = v.indexOf("charset=")
        if (at < 0) return ""
        var j = at + 8
        val sb = new java.lang.StringBuilder(12)
        while (j < v.length && v.charAt(j) != ';' &&
            !Character.isWhitespace(v.charAt(j))) {
          val c = v.charAt(j)
          if (c != '"' && c != '\'') sb.append(c)
          j += 1
        }
        return sb.toString
      }
      i = skipEol(s, eol)
    }
    ""
  }

  /** A named header's value from an HTTP payload's head section
    * (case-insensitive, trimmed; "" when the payload is not HTTP or
    * the header is absent) — the generic sibling of [[httpCharset]],
    * used for `Location` in redirect-chain resolution. Never reads
    * past the first blank line. */
  def httpHeaderValue(payload: Array[Byte], name: String): String = {
    if (payload == null || payload.length == 0 || name == null) return ""
    val s = new String(payload,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("HTTP/")) return ""
    val sep = s.indexOf("\r\n\r\n")
    val sepLf = s.indexOf("\n\n")
    val headEnd =
      if (sep >= 0 && (sepLf < 0 || sep <= sepLf)) sep
      else if (sepLf >= 0) sepLf
      else s.length
    var i = 0
    while (i < headEnd) {
      val eol = lineEnd(s, i)
      val line = s.substring(i, math.min(eol, headEnd))
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim.equalsIgnoreCase(name))
        return line.substring(colon + 1).trim
      i = skipEol(s, eol)
    }
    ""
  }

  /** Decode body bytes under a declared charset name — total: unknown,
    * unsupported, or empty names fall back to UTF-8, malformed byte
    * sequences decode to U+FFFD (never a throw). */
  def decode(body: Array[Byte], charset: String): String = {
    if (body == null || body.length == 0) return ""
    val cs =
      try {
        if (charset == null || charset.isEmpty)
          java.nio.charset.StandardCharsets.UTF_8
        else java.nio.charset.Charset.forName(charset)
      } catch {
        case _: Exception => java.nio.charset.StandardCharsets.UTF_8
      }
    new String(body, cs)
  }

  /** Unwrap an HTTP message payload: (status, body). Non-HTTP payloads
    * pass through as (-1, payload) — the caller decides; an HTTP head
    * with no blank-line terminator yields (status, empty). */
  def httpBody(payload: Array[Byte]): (Int, Array[Byte]) = {
    if (payload == null || payload.length == 0)
      return (-1, Array.emptyByteArray)
    val s = new String(payload,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("HTTP/")) return (-1, payload)
    val eol = lineEnd(s, 0)
    val line = s.substring(0, eol)
    val sp = line.indexOf(' ')
    val status = if (sp < 0) -1 else {
      val rest = line.substring(sp + 1).trim
      val end = rest.indexOf(' ')
      val tok = if (end < 0) rest else rest.substring(0, end)
      try {
        val v = Integer.parseInt(tok)
        if (v >= 100 && v <= 999) v else -1
      } catch { case _: NumberFormatException => -1 }
    }
    val sep = s.indexOf("\r\n\r\n")
    val sepLf = s.indexOf("\n\n")
    val (bodyAt, width) =
      if (sep >= 0 && (sepLf < 0 || sep <= sepLf)) (sep, 4)
      else if (sepLf >= 0) (sepLf, 2)
      else (-1, 0)
    val body =
      if (bodyAt < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(payload, bodyAt + width,
        payload.length)
    (status, body)
  }
}
