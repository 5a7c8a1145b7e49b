package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlOps

/** [[graft.operators.UrlOps]] — URL canonicalization. The oracled rows
  * are q_url_canonical / q_url_key_dedup (both engines canonicalize
  * independently); this pins the rule edges the planted variants don't
  * reach. */
class UrlOpsSpec extends SparkSpec {

  private def canon(url: String): String =
    spark.range(1).select(UrlOps.canonicalUrl(lit(url))).head().getString(0)

  test("default ports fold, non-default ports are kept") {
    assert(canon("http://www.Ex.Org:80/a/") == "https://ex.org/a")
    assert(canon("https://ex.org:443/a") == "https://ex.org/a")
    assert(canon("http://ex.org:8080/a") == "https://ex.org:8080/a",
      "a non-default port addresses a different server")
  }

  test("tracking params drop anywhere; survivors keep order") {
    assert(canon("https://ex.org/p?utm_source=a&id=1&ref=2&z=3&gclid=9")
      == "https://ex.org/p?id=1&z=3")
    // all-tracking query collapses to no query at all
    assert(canon("https://ex.org/p?utm_a=1&fbclid=2")
      == "https://ex.org/p")
    // ref must match as a NAME, not a prefix: refresh=1 survives
    assert(canon("https://ex.org/p?refresh=1")
      == "https://ex.org/p?refresh=1")
  }

  test("fragment always drops; root and trailing slash fold") {
    assert(canon("https://ex.org/a#sec") == "https://ex.org/a")
    assert(canon("https://ex.org/#top") == "https://ex.org")
    assert(canon("https://ex.org") == "https://ex.org")
    assert(canon("https://www.ex.org/") == "https://ex.org")
  }

  test("planted twins collapse: every dedup group is a caught pair") {
    val d = graft.operators.UrlOps.urlKeyDedup(spark, sfDir)
    assert(d.where(col("n_members") =!= 2 || col("n_raw") =!= 2).isEmpty,
      "each doc's two junk variants must fold to one canonical row")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(d.count() == docs)
  }
}
