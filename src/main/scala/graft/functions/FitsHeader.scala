package graft.functions

import scala.collection.immutable.ListMap

/** Minimal FITS header parser — the one genuinely custom kernel in the
  * engine (SURVEY.md §2.9, §7.3). FITS headers are a sequence of 80-byte
  * ASCII "cards" (`KEYWORD = value / comment`), terminated by an `END`
  * card; no external library is needed.
  *
  * The reference delegates header extraction to filetype plugin classes
  * (/root/reference/bin/save_DBB_stagein_to_DBB.py:160, cfg:18-19) driven
  * by the keyword contract table etc/decam_src_keywords.txt; here the
  * parse is a pure JVM function used from `Dataset.map` over `binaryFile`
  * rows — per-row compute with no shuffle, scales linearly with files.
  */
object FitsHeader {

  val CardLen = 80

  /** Parse header cards from the leading bytes of a FITS file into an
    * ordered keyword → value map. Stops at the END card or when bytes run
    * out. Values keep their raw text form; quoted strings are unquoted,
    * trailing comments (`/ ...`) stripped. Comment-ish cards (COMMENT,
    * HISTORY, blank keyword) are skipped. */
  def parse(bytes: Array[Byte]): Map[String, String] = {
    var out = ListMap.empty[String, String]
    var off = 0
    var done = false
    while (!done && off + CardLen <= bytes.length) {
      val card = new String(bytes, off, CardLen, "US-ASCII")
      val keyword = card.substring(0, math.min(8, card.length)).trim
      if (keyword == "END") done = true
      else if (keyword.nonEmpty && keyword != "COMMENT" && keyword != "HISTORY"
          && card.length > 9 && card.charAt(8) == '=') {
        out = out.updated(keyword, parseValue(card.substring(9)))
      }
      off += CardLen
    }
    out
  }

  private def parseValue(raw: String): String = {
    val s = raw.trim
    if (s.startsWith("'")) {
      // quoted string: ends at the next single quote ('' escapes a quote)
      val sb = new StringBuilder
      var i = 1
      var closed = false
      while (i < s.length && !closed) {
        val c = s.charAt(i)
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
          else { closed = true; i += 1 }
        } else { sb += c; i += 1 }
      }
      sb.result().trim
    } else {
      // numeric / logical: strip trailing comment
      val slash = s.indexOf('/')
      (if (slash >= 0) s.substring(0, slash) else s).trim
    }
  }

  /** Render a keyword→value map as a FITS header byte block (for tests and
    * fixtures): 80-byte cards + END, padded to a 2880-byte block. */
  def render(kv: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    kv.foreach { case (k, v) =>
      val isNum = v.nonEmpty && v.forall(c => c.isDigit || "+-.eE".contains(c))
      val value = if (isNum) v else s"'$v'"
      sb.append(s"%-8s= %s".format(k.take(8), value).padTo(CardLen, ' ').take(CardLen))
    }
    sb.append("END".padTo(CardLen, ' '))
    val block = math.max(2880, ((sb.length + 2879) / 2880) * 2880)
    sb.append(" " * (block - sb.length))
    sb.result().getBytes("US-ASCII")
  }
}
