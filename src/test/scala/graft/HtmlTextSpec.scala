package graft

import graft.functions.HtmlText.extract

/** [[graft.functions.HtmlText]] — extraction semantics + hostile inputs
  * (the kernel parses UNTRUSTED bytes; every malformed shape must
  * degrade, never throw). The oracled structural check is
  * q_html_extract; this pins the rules the oracle can't reach. */
class HtmlTextSpec extends SparkSpec {

  test("basic page: boilerplate dropped, blocks become lines") {
    val html = "<html><head><title>T</title><script>var x=1;</script>" +
      "<style>.a{}</style></head><body><nav><a href=\"/\">home</a></nav>" +
      "<h1>Hello World</h1><p>first para</p><p>second para</p>" +
      "<footer>legal</footer></body></html>"
    assert(extract(html) == "Hello World\nfirst para\nsecond para")
  }

  test("entities decode; unknown and unterminated stay literal") {
    assert(extract("<p>a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;</p>")
      == "a & b <c> \"d\" 'e'")
    assert(extract("<p>x&nbsp;y</p>") == "x y")
    assert(extract("<p>&#65;&#x42;</p>") == "AB")
    assert(extract("<p>&bogus; &amp</p>") == "&bogus; &amp")
    assert(extract("<p>a && b</p>") == "a && b")
  }

  test("link density: farms drop, single inline anchors keep their line") {
    val farm = "<p>real text here</p><div><a>one</a> <a>two</a> " +
      "<a>three</a></div><p>more text</p>"
    assert(extract(farm) == "real text here\nmore text")
    // one anchor, whatever its share of the line, never drops it
    assert(extract("<p><a href=\"x\">everything linked</a></p>")
      == "everything linked")
    // two anchors but mostly plain text: kept, anchors inlined
    assert(extract("<p>see <a>a</a> and <a>b</a> for much longer detail</p>")
      == "see a and b for much longer detail")
  }

  test("whitespace collapses, empty lines vanish") {
    assert(extract("<p>  a \t\n b  </p><p>   </p><p>c</p>") == "a b\nc")
  }

  test("comments, doctype, and processing instructions are skipped") {
    assert(extract("<!DOCTYPE html><!-- <p>junk</p> --><p>kept</p>" +
      "<?xml bits?>") == "kept")
    assert(extract("<!-- unterminated comment <p>gone</p>") == "")
  }

  test("hostile: unclosed tags flush at EOF") {
    assert(extract("<p>no closing tag ever") == "no closing tag ever")
    assert(extract("<div><p>nested unclosed") == "nested unclosed")
  }

  test("hostile: close of never-opened dropped tag is ignored") {
    assert(extract("</script><p>visible</p></nav>") == "visible")
  }

  test("hostile: dangling '<' swallows to EOF inside the tag scanner") {
    assert(extract("<p>before</p><a no-gt ever") == "before")
  }

  test("hostile: mismatched dropped-subtree closes do not underflow") {
    assert(extract("<script>x</style>y</script><p>after</p>") == "after")
  }

  test("nested dropped subtrees need both closes") {
    assert(extract("<nav><script>a</script><a>l</a></nav><p>ok</p>") == "ok")
  }

  test("self-closing dropped tag does not open a subtree") {
    assert(extract("<script src=\"x\"/><p>seen</p>") == "seen")
  }

  test("rawtext: tag-like text inside script/style never desyncs the drop") {
    // ADVICE r13: a drop-tag token in a JS string used to push a phantom
    // dropStack entry and swallow the rest of the document
    assert(extract("<script>document.write('<style>.x{}</style>');" +
      "</script><p>kept</p>") == "kept")
    assert(extract("<script>var s = '<script';</script><p>kept</p>")
      == "kept")
    assert(extract("<style>/* </p> inside comment */ a:after{content:'<'}" +
      "</style><p>kept</p>") == "kept")
    // close-tag candidate must be the appropriate end tag: a longer name
    // does not end the rawtext element
    assert(extract("<script>x</scripting>y</script><p>kept</p>") == "kept")
    // attributes on the close tag are tolerated per the spec's ws rule
    assert(extract("<script>x</script foo=bar><p>kept</p>") == "kept")
    // unclosed rawtext swallows to EOF (browser behavior)
    assert(extract("<p>before</p><script>var x = '<p>never</p>'") == "before")
    // rawtext inside an already-dropped subtree cannot end it early
    assert(extract("<head><script>var s='</head>';</script></head>" +
      "<p>kept</p>") == "kept")
  }

  test("quoted attribute values may contain '>' without truncating the tag") {
    // ADVICE r13: the scanner used to stop at the first '>' and leak the
    // attribute remnant into extracted text
    assert(extract("<p><a href=\"x>y\" title=\"t\">link text</a></p>")
      == "link text")
    assert(extract("<p before><img alt='a>b'>kept</p>") == "kept")
    // unterminated quote swallows the scan to EOF (malformed input)
    assert(extract("<p>seen</p><a href=\"never closes>gone") == "seen")
  }

  test("null and empty are total") {
    assert(extract(null) == "")
    assert(extract("") == "")
    assert(extract("plain text, no markup") == "plain text, no markup")
  }

  test("extractWithLinks: hrefs kept in order, entities decoded, " +
      "boilerplate anchors excluded, text identical to extract") {
    val html = "<html><head><script>var a='<a href=\"/fake\">';</script>" +
      "</head><body><nav><a href=\"/nav\">n</a></nav>" +
      "<p>see <a href=\"https://a.example/x?p=1&amp;q=2\">one</a> and " +
      "<a href='//proto-rel'>two</a> and <a href=/bare>three</a></p>" +
      "<div><a href=\"https://b.example/y\">four</a> " +
      "<a data-href=\"https://decoy.example\">five</a> <a>six</a></div>" +
      "<footer><a href=\"/legal\">l</a></footer></body></html>"
    val (text, links) = graft.functions.HtmlText.extractWithLinks(html)
    assert(text == extract(html))
    // nav/footer (dropped subtrees) and the script string never emit;
    // data-href is not href; a bare <a> has no href
    assert(links == Seq("https://a.example/x?p=1&q=2", "//proto-rel",
      "/bare", "https://b.example/y"))
  }

  test("extractWithAnchors: anchor text collapsed beside its href; " +
      "nested/unclosed anchors; text identical to extract") {
    val html = "<p>see <a href=\"https://a.example/\">the  first\nlink</a>" +
      " and <a href=\"https://b.example/\">b <b>bold</b> tail</a>" +
      " then <a>no href</a>" +
      " <a href=\"https://c.example/\">outer <a href=\"https://d.example/\">" +
      "inner</a></p><div><a href=\"https://e.example/\">unclosed tail"
    val (text, pairs) = graft.functions.HtmlText.extractWithAnchors(html)
    assert(text == extract(html))
    assert(pairs == Seq(
      "https://a.example/" -> "the first link",
      "https://b.example/" -> "b bold tail",
      // nested <a> closes the open pair first (browser behavior)
      "https://c.example/" -> "outer",
      "https://d.example/" -> "inner",
      // unclosed anchor flushes at EOF
      "https://e.example/" -> "unclosed tail"), pairs.toString)
  }

  test("attrValue: proper attribute scan, quoted/bare/valueless, " +
      "href inside another value never matches") {
    import graft.functions.HtmlText.attrValue
    assert(attrValue("a href=\"u\"", "href").contains("u"))
    assert(attrValue("a class='c' HREF='u'", "href").contains("u"))
    assert(attrValue("a href=bare rel=x", "href").contains("bare"))
    assert(attrValue("a href = 'sp' ", "href").contains("sp"))
    assert(attrValue("a data-href='d'", "href").isEmpty)
    assert(attrValue("a title=\"href=trap\" href='real'", "href")
      .contains("real"))
    assert(attrValue("a href", "href").isEmpty) // valueless
    assert(attrValue("a href='unterminated", "href")
      .contains("unterminated"))
    assert(attrValue("a/href='x'", "href").contains("x"))
    assert(attrValue("img src='s'/", "src").contains("s"))
  }

  test("extraction feeds text analysis: stats over extracted text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the composition a web pipeline runs: html -> extract -> textStats'
    // token/char measures over the clean text
    val docs = Seq((1L, "<body><nav><a>x</a></nav><h1>alpha beta</h1>" +
      "<p>gamma delta epsilon</p></body>")).toDF("doc_id", "html")
    val txt = docs.as[(Long, String)]
      .map { case (id, h) => (id, graft.functions.HtmlText.extract(h)) }
      .toDF("doc_id", "text")
    val row = txt.select(size(filter(split(col("text"), "\\s+"),
      t => t =!= "")).as("n_tok"), length(col("text")).as("n_chars"))
      .head()
    assert(row.getInt(0) == 5)
    assert(row.getInt(1) == "alpha beta\ngamma delta epsilon".length)
  }
}
