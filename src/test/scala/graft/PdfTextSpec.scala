package graft

import graft.functions.PdfText

/** [[graft.functions.PdfText]] — PDF text-operator walker. The oracled
  * row is q_pdf_extract (uncompressed streams, column-expression
  * synthesis); this pins the FlateDecode path, the string-syntax
  * corners, and the hostile-input posture the oracle can't reach. */
class PdfTextSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def pdfWith(content: String, filter: String = ""): Array[Byte] = {
    val c = bytes(content)
    bytes(s"%PDF-1.4\n4 0 obj << /Length ${c.length}$filter >> stream\n") ++
      c ++ bytes("\nendstream endobj\n%%EOF")
  }

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes(s)); d.finish()
    val buf = new Array[Byte](s.length + 64)
    val n = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  test("show operators: Tj, TJ with kerning, ' and \", in order") {
    val r = PdfText.extract(pdfWith(
      "BT /F1 12 Tf (ab) Tj [(c) -250 (d) 17 (e)] TJ (f) ' 1 2 (g) \" ET"))
    assert(r.text == "abcdefg")
    assert(r.n_text_ops == 4 && r.n_streams == 1 && r.n_flate == 0)
  }

  test("strings outside BT/ET never show; other operators drop operands") {
    val r = PdfText.extract(pdfWith(
      "(lost) Tj BT (x) (kept) Tj (dropped) Tf (also) Tj ET (gone) Tj"))
    // Tj shows the LAST pending string; Tf consumes its operands
    assert(r.text == "keptalso", r.text)
    assert(r.n_text_ops == 2)
  }

  test("escapes, nested parens, octal, continuation, hex strings") {
    val r = PdfText.extract(pdfWith(
      "BT (a\\(b\\)c\\\\d) Tj (ne(st)ed) Tj (\\101\\102) Tj " +
        "(li\\\nne) Tj <414 2> Tj <5> Tj (t\\tn\\n) Tj ET"))
    // <414 2>: whitespace inside hex skipped -> 0x41 0x42; <5>: odd
    // digit count zero-pads -> 0x50
    assert(r.text == "a(b)c\\d" + "ne(st)ed" + "AB" + "line" +
      "AB" + "P" + "t\tn\n", r.text)
    assert(r.n_text_ops == 7)
  }

  test("FlateDecode stream walks identically to the raw form") {
    val content = "BT [(he) -3 (llo)] TJ ( world) Tj ET"
    val raw = PdfText.extract(pdfWith(content))
    val c = deflate(content)
    val flate = PdfText.extract(
      bytes(s"%PDF-1.4\n4 0 obj << /Length ${c.length} " +
        s"/Filter /FlateDecode >> stream\n") ++ c ++
        bytes("\nendstream endobj\n%%EOF"))
    assert(raw.text == "hello world" && flate.text == raw.text)
    assert(flate.n_flate == 1 && raw.n_flate == 0)
    assert(flate.n_text_ops == raw.n_text_ops)
  }

  test("multiple streams concatenate in file order") {
    val p = bytes("%PDF-1.4\n") ++
      pdfWith("BT (one) Tj ET").drop("%PDF-1.4\n".length) ++
      pdfWith("BT (two) Tj ET").drop("%PDF-1.4\n".length)
    val r = PdfText.extract(p)
    assert(r.text == "onetwo" && r.n_streams == 2)
  }

  test("non-flate filters are skipped as non-text payload") {
    val r = PdfText.extract(pdfWith("BT (jpegbytes) Tj ET",
      filter = " /Filter /DCTDecode"))
    assert(r.text == "" && r.n_streams == 1)
  }

  test("hostile inputs never throw and stay bounded") {
    // truncated: no endstream — walks to EOF
    val torn = PdfText.extract(bytes(
      "x obj << >> stream\nBT (sur) Tj (vives) Tj"))
    assert(torn.text == "survives")
    // unterminated string flushes at end of content
    val unterm = PdfText.extract(pdfWith("BT (open forever"))
    assert(unterm.text == "" && unterm.n_text_ops == 0)
    // unterminated hex string
    assert(PdfText.extract(pdfWith("BT <4142")).n_text_ops == 0)
    // lying /Length is ignored (keyword-bounded walk)
    val lying = PdfText.extract(bytes(
      "1 0 obj << /Length 999999 >> stream\nBT (ok) Tj ET\n" +
        "endstream endobj"))
    assert(lying.text == "ok")
    // deflate bomb: 64 MiB of zeros compresses tiny; output is capped,
    // no OOM, no throw
    val bomb = {
      val d = new java.util.zip.Deflater()
      d.setInput(new Array[Byte](64 << 20)); d.finish()
      val buf = new Array[Byte](1 << 20)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val bombed = PdfText.extract(
      bytes(s"1 0 obj << /Filter /FlateDecode >> stream\n") ++ bomb ++
        bytes("\nendstream"))
    assert(bombed.n_streams == 1) // walked, bounded, no text ops
    // corrupt deflate bytes degrade to empty, not an exception
    val corrupt = PdfText.extract(
      bytes("1 0 obj << /Filter /FlateDecode >> stream\nnotzlib\n" +
        "endstream"))
    assert(corrupt.text == "")
    // empty / null / garbage
    assert(PdfText.extract(Array.emptyByteArray).n_streams == 0)
    assert(PdfText.extract(null).n_streams == 0)
    assert(PdfText.extract(bytes("not a pdf at all")).n_streams == 0)
  }
}
