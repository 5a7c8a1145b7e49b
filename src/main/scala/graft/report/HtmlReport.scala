package graft.report

import org.apache.spark.sql.DataFrame

/** HTML report rendering — reference S19 (`monitor_DBB_stagein.py`
  * print_summary_html / print_exposure_html / print_sne_html,
  * monitor:319-689). The engine computes small final DataFrames; rendering
  * collects them to the driver (they are report-sized by construction —
  * per-nite summaries, top-20 lists) and emits a table per section.
  *
  * Deliberately driver-side and dependency-free: rendering is not a
  * distributed concern (SURVEY §2.1 S19).
  */
object HtmlReport {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render one DataFrame as an HTML table. `highlight` marks rows (by
    * predicate on the row's string map) with a CSS class — the monitor's
    * 3-day recency highlight (monitor:664). */
  def table(df: DataFrame, caption: String,
      highlight: Map[String, String] => Boolean = _ => false): String = {
    val cols = df.columns
    val rows = df.collect()
    val sb = new StringBuilder
    sb.append(s"<table border='1'>\n<caption>${esc(caption)}</caption>\n<tr>")
    cols.foreach(c => sb.append(s"<th>${esc(c)}</th>"))
    sb.append("</tr>\n")
    rows.foreach { r =>
      val m = cols.zipWithIndex.map { case (c, i) =>
        c -> (if (r.isNullAt(i)) "&nbsp;" else esc(String.valueOf(r.get(i))))
      }.toMap
      val cls = if (highlight(m)) " class='recent'" else ""
      sb.append(s"<tr$cls>")
      cols.foreach(c => sb.append(s"<td>${m(c)}</td>"))
      sb.append("</tr>\n")
    }
    sb.append("</table>\n")
    sb.result()
  }

  /** Full report document: titled sections, generation time stamp in the
    * footer (monitor:329-333 prints wall-clock into every page). */
  def render(title: String, sections: Seq[(String, DataFrame)],
      tookSecs: Double): String = {
    val body = sections.map { case (cap, df) => table(df, cap) }.mkString("\n")
    s"""<html><head><title>${esc(title)}</title>
       |<style>tr.recent { background: #fdd; }</style></head>
       |<body><h1>${esc(title)}</h1>
       |$body
       |<p>Took ${f"$tookSecs%.4f"} secs to generate</p>
       |</body></html>""".stripMargin
  }
}
