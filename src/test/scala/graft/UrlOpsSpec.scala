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

  test("sitemap discovery: no false negatives; frontier priority " +
      "composes politeness") {
    val d = UrlOps.sitemapDiscovery(spark, sfDir).collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      val (might, known, defNew) =
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))
      assert(!known || might,
        "a known URL must answer might_contain (no false negatives)")
      assert(defNew == !might)
      assert(!defNew || !known,
        "definitely_new may never hit a known URL")
    }
    // both planted classes appear: known pages and undiscovered ones
    assert(d.exists(_.getBoolean(3)) && d.exists(!_.getBoolean(3)))
    val f = UrlOps.frontierRank(spark, sfDir).collect()
    f.foreach { r =>
      assert(r.getLong(4) ==
        r.getLong(2) * 1000 / math.max(r.getLong(3), 1L),
        "priority must be the politeness-adjusted integer ratio")
    }
    assert(f.exists(_.getLong(2) > 0), "some host must have new URLs")
  }

  test("eTLD+1: exception beats wildcard, suffix-hosts have no " +
      "registrable, subdomain shapes fold") {
    val rows = UrlOps.etld1(spark, sfDir).collect()
    val byHost = rows.map(r => (r.getString(1), r)).toMap
    // !except.wild.test cancels *.wild.test: suffix falls back to
    // wild.test and the host IS registrable
    val ex = byHost("except.wild.test")
    assert(ex.getInt(3) == 2 && ex.getString(4) == "wild.test"
      && ex.getString(5) == "except.wild.test")
    // the wildcard makes site<k>.wild.test itself the public suffix
    val wc = rows.find(_.getString(1).startsWith("deep.site")).get
    assert(wc.getInt(3) == 3 && wc.getString(5) == wc.getString(1))
    // a host that IS a public suffix has no eTLD+1
    assert(byHost("co.test").isNullAt(5))
    // default '*' rule: nothing deeper than the TLD matched => len 1
    val plain = byHost.get("site0.org").orElse(byHost.get("site1.org")).get
    assert(plain.getInt(3) == 1)
    // the fold: bare + www. + a.b. land in ONE registrable group
    val g = UrlOps.etld1Group(spark, sfDir).collect()
    assert(g.exists(r => r.getString(0).matches("site\\d\\.org")
      && r.getLong(1) == 3),
      "three host shapes must collapse onto one site<k>.org registrable")
  }
}
