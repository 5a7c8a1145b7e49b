package graft

import java.nio.file.{Files, Paths}
import graft.report.MonitorJob

/** The composed monitor run (reference monitor_DBB_stagein.py:319-689):
  * the four reports assembled from the individually-oracled operators,
  * pinned end-to-end as GOLDEN FILES over the fixed sf0.001 testdata.
  *
  * Regenerate goldens after an intentional report change with
  * `GRAFT_UPDATE_GOLDEN=1 sbt "testOnly graft.MonitorJobSpec"` (writes
  * into src/test/resources/golden/), then review the diff like any code.
  */
class MonitorJobSpec extends SparkSpec {

  private val generatedAt = "2024-06-01T00:00:00Z"
  private def renderAll: Map[String, String] =
    MonitorJob.render(spark, sfDir, generatedAt, tookSecs = 0.0)

  test("four reports render and a fixed-input run is byte-stable") {
    val a = renderAll
    val b = renderAll
    assert(a.keySet == MonitorJob.ReportNames.toSet)
    assert(a == b, "same inputs must render byte-identical reports")
    a.values.foreach { html =>
      assert(html.startsWith("<html>") && html.endsWith("</html>"))
      assert(html.contains(generatedAt))
    }
  }

  test("run() writes all four reports to the output dir") {
    val out = Files.createTempDirectory("monitor").toString
    val pages = MonitorJob.run(spark, sfDir, out, generatedAt, 0.0)
    MonitorJob.ReportNames.foreach { n =>
      val p = Paths.get(out, n)
      assert(Files.exists(p), s"missing report $n")
      assert(new String(Files.readAllBytes(p), "UTF-8") == pages(n),
        "file content = rendered content")
    }
  }

  test("short exposure report lists only differences; full lists all") {
    val pages = renderAll
    def dataRows(html: String): Int = html.sliding(4).count(_ == "<tr>")
    val short = dataRows(pages("dtsmonitor_exp_short.html"))
    val full = dataRows(pages("dtsmonitor_exp_full.html"))
    assert(short < full,
      s"short ($short rows) must be a strict subset of full ($full rows)")
    assert(!pages("dtsmonitor_exp_short.html").contains("<td>ok</td>"),
      "short report must not list ok exposures")
  }

  test("reports match the golden files (fixed-seed data, byte-exact)") {
    val goldenDir = Paths.get("src/test/resources/golden")
    val pages = renderAll
    if (sys.env.get("GRAFT_UPDATE_GOLDEN").contains("1")) {
      Files.createDirectories(goldenDir)
      pages.foreach { case (n, html) =>
        Files.write(goldenDir.resolve(n), html.getBytes("UTF-8")) }
      info(s"goldens regenerated under $goldenDir")
    }
    MonitorJob.ReportNames.foreach { n =>
      val p = goldenDir.resolve(n)
      assert(Files.exists(p),
        s"golden missing: $p (regenerate with GRAFT_UPDATE_GOLDEN=1)")
      val golden = new String(Files.readAllBytes(p), "UTF-8")
      assert(pages(n) == golden, s"$n drifted from its golden file")
    }
  }
}
