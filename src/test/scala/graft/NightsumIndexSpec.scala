package graft

import graft.sources.NightsumIndex
import org.apache.spark.sql.functions._

class NightsumIndexSpec extends SparkSpec {

  private val html =
    """<html><body>
      |<a href="nightsum-20240114/index.html">Jan 14</a>
      |<a href='nightsum-20240115/index.html' class="x">Jan 15</a>
      |<a href="other/page.html">no nite here</a>
      |<a href="nightsum-20240115/index.html">duplicate</a>
      |</body></html>""".stripMargin

  test("extracts distinct (nite, url) pairs, ignores non-nite links") {
    val links = NightsumIndex.parseLinks(html)
    assert(links.map(_.nite).sorted == Seq("20240114", "20240115"))
    assert(links.forall(_.url.contains("nightsum-")))
  }

  test("injectable fetch seam: load(url, fetch) fetches then parses") {
    // a deployment passes its HTTP client; tests pass a fake — the url
    // must flow through and the parse must see exactly the fetched body
    var fetched: String = null
    val fake: String => String = { url => fetched = url; html }
    val df = NightsumIndex.load(spark, "https://ctio/nightsum/index.html", fake)
    assert(fetched == "https://ctio/nightsum/index.html")
    assert(df.collect().map(_.getAs[String]("nite")).sorted.toSeq
      == Seq("20240114", "20240115"))
  }

  test("DataFrame form joins against per-nite frames") {
    val df = NightsumIndex.parse(spark, html)
    assert(df.columns.toSeq == Seq("nite", "url"))
    import spark.implicits._
    val nites = Seq("20240114", "20240199").toDF("nite")
    val joined = nites.join(df, Seq("nite"), "left_outer")
    assert(joined.where($"url".isNotNull).count() == 1)
  }
}
