package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Nightsum index source — SURVEY §2.1 S14 (monitor:300-315): the
  * reference fetches a nightly-summary index page over HTTP and
  * regex-extracts nite → URL links.
  *
  * The fetch is a driver-side concern (a tiny page; not a distributed
  * source — and this environment is zero-egress), so it is injected as a
  * string: `parse(spark, html)` turns the page into a `(nite, url)`
  * DataFrame joinable against the per-nite reconciliation frames. A
  * deployment wires `fetch` to its HTTP client of choice.
  */
object NightsumIndex {

  /** Matches anchor hrefs whose text or target carries an 8-digit nite,
    * e.g. <a href="nightsum-20240115/index.html">20240115</a>. */
  private val LinkRe =
    """<a\s+[^>]*href=["']([^"']*?(\d{8})[^"']*)["'][^>]*>""".r

  case class NightsumLink(nite: String, url: String)

  def parseLinks(html: String): Seq[NightsumLink] =
    LinkRe.findAllMatchIn(html)
      .map(m => NightsumLink(m.group(2), m.group(1)))
      .toSeq.distinct

  def parse(spark: SparkSession, html: String): DataFrame = {
    import spark.implicits._
    parseLinks(html).toDF()
  }

  /** Injectable-fetch form (ADVICE r3): a deployment passes its HTTP
    * client as `fetch: url => body` (e.g. `scala.io.Source.fromURL(_)
    * .mkString` behind whatever auth/retry policy it runs) and this source
    * fetches + parses without the caller pre-reading the page. The parser
    * stays pure and separately testable; the zero-egress test environment
    * injects a fake fetcher. */
  def load(spark: SparkSession, url: String,
      fetch: String => String): DataFrame =
    parse(spark, fetch(url))
}
