package graft.functions

import scala.collection.mutable.ArrayBuffer

/** HTML/markup → text extraction — the FIRST operator of a real
  * web-crawl training-data pipeline (VERDICT r12 item 2): boilerplate
  * removal at the DOM level, BEFORE the shingle-level operators
  * ([[graft.operators.TextOps]]'s `boilerplate`/`crossDocScrub`) can
  * see any text. Same discipline as the [[FitsHeader]] / [[IsoBmff]]
  * kernels: a pure-JVM single-pass walker over untrusted bytes, run as
  * a `Dataset.map` (map-only, no shuffle — the scan parallelizes by
  * input split, so at 100 TB this divides by executors like every
  * other decode kernel).
  *
  * Extraction semantics (deterministic, oracle-checkable):
  *
  *  - **Dropped subtrees**: `script`, `style`, `noscript`, `template`,
  *    `svg`, `iframe`, `head`, `nav`, `header`, `footer`, `aside` — the
  *    structural-boilerplate set; everything inside contributes nothing.
  *  - **Comments** `<!-- -->`, doctype and processing `<! >` / `<? >`
  *    constructs are skipped.
  *  - **Block elements** (`p`, `div`, `h1`–`h6`, `li`, `ul`, `ol`,
  *    `table`, `tr`, `td`, `th`, `br`, `hr`, `section`, `article`,
  *    `main`, `blockquote`, `pre`, `title`, `body`, `html`, `form`)
  *    start a new output line at both open and close; inline tags
  *    (`a`, `b`, `i`, `em`, `strong`, `span`, anything unknown) do not.
  *  - **Entities**: named `amp lt gt quot apos nbsp` and numeric
  *    `&#NN;` / `&#xHH;` decode; `nbsp` decodes to a plain space; an
  *    unterminated or unknown `&...` stays literal.
  *  - **Link-density boilerplate**: a line whose anchor-enclosed text
  *    is more than half its non-whitespace characters AND that contains
  *    ≥ 2 anchors is dropped (link farms, "related articles" blocks);
  *    a single inline link never drops its line.
  *  - **Whitespace**: runs collapse to one space, lines are trimmed,
  *    empty lines vanish; output lines join with `\n`.
  *
  * Hostile-input posture (spec-pinned): unclosed tags flush at EOF, a
  * close tag for a never-opened element is ignored, a `<` that never
  * finds `>` is treated as text-to-EOF inside the tag scanner (bounded
  * by input length — single pass, no backtracking, O(len) always).
  *
  * Two rules track how HTML actually parses (ADVICE r13):
  *
  *  - **Rawtext elements** (`script`, `style`, `noscript`, `iframe`):
  *    their content is NOT tokenized — on the open tag the scanner jumps
  *    straight to the matching case-insensitive `</name` (this is the
  *    HTML rawtext state). Tag-like text inside — a `document.write(
  *    '<style>…')` or an inline `'<script'` string literal — can
  *    therefore never desynchronize the drop stack and swallow the rest
  *    of the page. The structural drop tags (`head`, `nav`, …) keep the
  *    stack walk because they contain genuinely nested markup.
  *  - **Quote-aware tag scan**: the tag-closing `>` search skips quoted
  *    attribute sections, so `<a href="x>y">` neither truncates the tag
  *    nor leaks `y">` into the extracted text.
  */
object HtmlText {
  private val DropSubtree = Set("script", "style", "noscript", "template",
    "svg", "iframe", "head", "nav", "header", "footer", "aside")

  /** Content parsed as raw text (no nested tags), per the HTML rawtext /
    * script-data tokenizer states. All ⊆ [[DropSubtree]], so skipping the
    * content wholesale is exactly the drop semantics. */
  private val RawText = Set("script", "style", "noscript", "iframe")

  private val BlockTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5",
    "h6", "li", "ul", "ol", "table", "tr", "td", "th", "br", "hr",
    "section", "article", "main", "blockquote", "pre", "title", "body",
    "html", "form")

  /** Minimum anchors before link-density can drop a line. */
  val MinAnchorsToDrop = 2

  /** Extract visible text from HTML per the rules above. Total-function:
    * never throws on malformed input. */
  def extract(html: String): String = run(html, null)

  /** [[extract]] plus the OUTLINKS: the `href` value of every `<a>`
    * open tag OUTSIDE dropped subtrees (a nav/footer/script anchor is
    * boilerplate — the same scope the link-density rule already walks),
    * in document order, entities decoded, duplicates kept (edge weights
    * count them). The walker was already visiting every anchor for the
    * link-density census; this keeps the hrefs instead of discarding
    * them — the relation a content-derived link graph
    * ([[graft.operators.GraphOps]]) aggregates. */
  def extractWithLinks(html: String): (String, Seq[String]) =
    extractWithAnchors(html) match { case (t, as) => (t, as.map(_._1)) }

  /** [[extractWithLinks]] with each link's ANCHOR TEXT beside it —
    * (href, visible text inside the `<a>…</a>`, whitespace-collapsed,
    * entities decoded; "" for an empty or image-only anchor). Anchor
    * text is the classic web-IR description of the TARGET (how the
    * rest of the web names a page), the signal
    * [[graft.operators.GraphOps]] aggregates per target domain. A
    * valueless/href-less anchor still contributes to link density but
    * emits no pair; an unclosed anchor flushes at EOF; a nested `<a>`
    * (illegal HTML) closes the open pair first, like browsers do. */
  def extractWithAnchors(html: String): (String, Seq[(String, String)]) = {
    val anchors = ArrayBuffer.empty[(String, String)]
    (run(html, anchors), anchors.toSeq)
  }

  private def run(html: String,
      links: ArrayBuffer[(String, String)]): String = {
    val s = Option(html).getOrElse("")
    val lines = ArrayBuffer.empty[String]
    val buf = new java.lang.StringBuilder(64)
    var anchorChars = 0 // non-ws chars inside <a> on the current line
    var totalChars = 0 // non-ws chars on the current line
    var anchors = 0 // anchor opens on the current line
    var anchorDepth = 0
    var dropDepth = 0 // >0 → inside a dropped subtree
    val dropStack = ArrayBuffer.empty[String]
    // the open anchor pair under construction (anchor collection only)
    var openHref: String = null
    val anchorBuf = new java.lang.StringBuilder(32)

    def flushAnchor(): Unit = {
      if (links != null && openHref != null)
        links += ((openHref, collapseWs(anchorBuf.toString)))
      openHref = null
      anchorBuf.setLength(0)
    }

    def flush(): Unit = {
      val collapsed = collapseWs(buf.toString)
      if (collapsed.nonEmpty &&
          !(anchors >= MinAnchorsToDrop && 2 * anchorChars > totalChars))
        lines += collapsed
      buf.setLength(0); anchorChars = 0; totalChars = 0; anchors = 0
    }

    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val end = s.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else {
          val end = tagEnd(s, i + 1)
          if (end < 0) { i = n } // dangling '<...': nothing visible
          else {
            val inner = s.substring(i + 1, end).trim
            val closing = inner.startsWith("/")
            val body = if (closing) inner.drop(1) else inner
            val name = body.takeWhile(ch => ch.isLetterOrDigit).toLowerCase
            val selfClosed = inner.endsWith("/")
            var next = end + 1
            if (name.nonEmpty) {
              if (!closing && !selfClosed && RawText(name)) {
                // rawtext: content is never tokenized — jump past the
                // matching close tag (or to EOF if unclosed)
                next = skipRawText(s, end + 1, name)
              } else if (DropSubtree(name)) {
                if (closing) {
                  if (dropStack.nonEmpty && dropStack.last == name) {
                    dropStack.remove(dropStack.size - 1); dropDepth -= 1
                  } // close of a never-opened dropped tag: ignore
                } else if (!selfClosed) { dropStack += name; dropDepth += 1 }
              } else if (dropDepth == 0) {
                if (BlockTags(name)) flush()
                else if (name == "a") {
                  if (closing) {
                    anchorDepth = math.max(0, anchorDepth - 1)
                    flushAnchor()
                  } else {
                    anchors += 1; anchorDepth += 1
                    flushAnchor() // nested <a>: close the open pair first
                    if (links != null)
                      openHref = attrValue(inner, "href")
                        .map(decodeEntities).orNull
                  }
                }
              }
            }
            i = next
          }
        }
      } else if (c == '&' && dropDepth == 0) {
        val (decoded, next) = entity(s, i)
        decoded.foreach { d =>
          buf.append(d)
          if (openHref != null) anchorBuf.append(d)
          if (!Character.isWhitespace(d)) {
            totalChars += 1
            if (anchorDepth > 0) anchorChars += 1
          }
        }
        i = next
      } else {
        if (dropDepth == 0) {
          buf.append(c)
          if (openHref != null) anchorBuf.append(c)
          if (!Character.isWhitespace(c)) {
            totalChars += 1
            if (anchorDepth > 0) anchorChars += 1
          }
        }
        i += 1
      }
    }
    flushAnchor() // an unclosed anchor still yields its pair
    flush()
    lines.mkString("\n")
  }

  /** Value of the first `attr` attribute in a tag body (the text
    * between `<` and `>`): a proper forward attribute scan — skip the
    * tag name, then walk `name [= value]` sections with quoted or bare
    * values — so `data-href` never matches `href` and an `href=` inside
    * another attribute's quoted VALUE is never mistaken for the
    * attribute (the failure modes of a substring search). None for a
    * missing attribute or a valueless one (`<a href>`). */
  private[graft] def attrValue(tagBody: String, attr: String): Option[String] = {
    val n = tagBody.length
    var i = 0
    // tag name ends at whitespace OR '/' (HTML treats `<a/href=x>` as
    // a solidus-separated attribute, not part of the name)
    while (i < n && !Character.isWhitespace(tagBody.charAt(i)) &&
      tagBody.charAt(i) != '/') i += 1
    while (i < n) {
      while (i < n && (Character.isWhitespace(tagBody.charAt(i)) ||
        tagBody.charAt(i) == '/')) i += 1
      if (i >= n) return None
      val ns = i
      while (i < n && !Character.isWhitespace(tagBody.charAt(i)) &&
        tagBody.charAt(i) != '=' && tagBody.charAt(i) != '/') i += 1
      val name = tagBody.substring(ns, i)
      while (i < n && Character.isWhitespace(tagBody.charAt(i))) i += 1
      var value: String = null
      if (i < n && tagBody.charAt(i) == '=') {
        i += 1
        while (i < n && Character.isWhitespace(tagBody.charAt(i))) i += 1
        if (i < n && (tagBody.charAt(i) == '"' || tagBody.charAt(i) == '\'')) {
          val q = tagBody.charAt(i)
          val e = tagBody.indexOf(q, i + 1)
          if (e < 0) { value = tagBody.substring(i + 1); i = n }
          else { value = tagBody.substring(i + 1, e); i = e + 1 }
        } else {
          val vs = i
          while (i < n && !Character.isWhitespace(tagBody.charAt(i))) i += 1
          value = tagBody.substring(vs, i)
        }
      }
      if (name.equalsIgnoreCase(attr)) return Option(value)
    }
    None
  }

  /** Entity-decode an attribute value (`?a=1&amp;b=2` carries its `&`
    * as an entity in conforming markup) — the same [[entity]] rules as
    * text content. */
  private def decodeEntities(v: String): String = {
    if (v.indexOf('&') < 0) return v
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '&') {
        val (decoded, next) = entity(v, i)
        sb.append(decoded); i = next
      } else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Index of the tag-closing '>' at/after `from`, skipping quoted
    * attribute sections (`"…"` / `'…'`) so a '>' inside an attribute
    * value never truncates the tag; -1 when no unquoted '>' exists
    * (dangling tag — caller treats as text-to-EOF). An unterminated
    * quote swallows the rest of the scan, which is the browser behavior
    * for the same malformed input. */
  private def tagEnd(s: String, from: Int): Int = {
    var j = from
    var quote: Char = 0
    while (j < s.length) {
      val ch = s.charAt(j)
      if (quote != 0) { if (ch == quote) quote = 0 }
      else if (ch == '"' || ch == '\'') quote = ch
      else if (ch == '>') return j
      j += 1
    }
    -1
  }

  /** Rawtext skip: first index AFTER the matching case-insensitive
    * `</name` close tag at/after `from` (the close-tag name must be
    * followed by '>', '/', or whitespace, per the HTML "appropriate end
    * tag" rule — `</scripting>` does not end `<script>`); input length
    * when unclosed. Single forward scan, no allocation. */
  private def skipRawText(s: String, from: Int, name: String): Int = {
    val n = s.length
    var j = from
    while (j < n) {
      j = s.indexOf('<', j)
      if (j < 0) return n
      if (j + 2 + name.length <= n && s.charAt(j + 1) == '/' &&
          s.regionMatches(true, j + 2, name, 0, name.length)) {
        val after = j + 2 + name.length
        if (after >= n) return n // '</name' at EOF: unclosed
        val ch = s.charAt(after)
        if (ch == '>') return after + 1
        if (ch == '/' || Character.isWhitespace(ch)) {
          val gt = s.indexOf('>', after)
          return if (gt < 0) n else gt + 1
        }
      }
      j += 1
    }
    n
  }

  /** Decode one entity at `s(i) == '&'` → (decoded chars, next index).
    * Unknown/unterminated entities yield the literal '&' and advance
    * one char (never consumes what it did not decode). */
  private def entity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val name = s.substring(i + 1, semi)
    val out = name match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if name.startsWith("#x") || name.startsWith("#X") =>
        try String.valueOf(Character.toChars(
          Integer.parseInt(name.drop(2), 16)))
        catch { case _: Exception => null }
      case _ if name.startsWith("#") =>
        try String.valueOf(Character.toChars(Integer.parseInt(name.drop(1))))
        catch { case _: Exception => null }
      case _ => null
    }
    if (out == null) ("&", i + 1) else (out, semi + 1)
  }

  private def collapseWs(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var pendingSpace = false
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
