package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** [EXT] URL DEDUP-KEY canonicalization — the aggressive second level
  * of the URL story: [[CurationOps.canonicalizeUrl]] is the
  * DISPLAY-canonical form (scheme preserved — `http://x` and
  * `https://x` stay distinct URLs), used by the funnel's crawl-dedup
  * stage; THIS module derives the DEDUP KEY, where the same page
  * crawled as `http://` and `https://`, with and without `www.`, with
  * default ports, trailing slashes, tracking parameters (`utm_*`,
  * `ref`, `fbclid`, `gclid`) and fragments must all COLLAPSE — the key
  * URL-keyed dedup and the domain link-graph family ([[GraphOps]])
  * stand on. The reference's closest surface is path templating
  * (`${var}` expansion); this is its inverse — reducing a messy
  * identifier to its canonical key.
  *
  * Everything here is PURE built-in column expressions (regexp over
  * the RFC 3986 delimiters, split / filter / array_join over the query
  * string) — codegen'd, no custom kernels — with a DuckDB twin built
  * from the same regexes, so both engines canonicalize independently
  * and the hashes must agree.
  *
  * Canonical form (the dedup-key convention, deliberately aggressive):
  * scheme folded to `https`, host lowercased with `www.` and default
  * ports (`:80`/`:443`) stripped (non-default ports are KEPT — they
  * address a different server), ONE trailing slash stripped from the
  * path, tracking parameters dropped (other parameters keep their
  * original order — reordering would need a stance on duplicate keys),
  * fragment dropped (never sent to the server).
  *
  * The corpus carries no URL column, so one is SYNTHESIZED per doc
  * from (doc_id, source) in six planted variants (scheme case, www,
  * ports, trailing slash, utm/ref junk, fragments) — every variant of
  * a doc canonicalizes to the same URL, which is exactly the planted
  * regime the dedup query grades.
  *
  * Scale shape: canonicalization is a pure map riding in the scan's
  * codegen'd projection; [[urlKeyDedup]] is the standard fingerprint
  * hash-groupBy on the canonical key — at 100 TB this is exact dedup's
  * shuffle with a canonical key instead of a raw one. */
object UrlOps {

  /** Tracking parameters to drop — name match before `=` (or a bare
    * name with no value). */
  val TrackingParams = "^(utm_[^=]*|ref|fbclid|gclid)(=|$)"
  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** Synthesized URL for a doc under planted variant `v` (0..5) —
    * same canonical form for every v. */
  private def variantUrl(v: Column, docId: Column, src: Column): Column = {
    val path = concat(lit("/docs/"), docId.cast("string"))
    val host = concat(lit("www."), src, lit(".example.org"))
    when(v === 0, concat(lit("https://"), host, path))
      .when(v === 1, concat(lit("HTTP://"), upper(host), lit(":80"),
        path, lit("/")))
      .when(v === 2, concat(lit("https://"), host, lit(":443"), path,
        lit("?utm_source=feed&utm_campaign=c")))
      .when(v === 3, concat(lit("http://"), host, path,
        lit("?id=7&utm_medium=email&ref=x#frag")))
      .when(v === 4, concat(lit("https://"), host, path,
        lit("?a=1&b=2")))
      .otherwise(concat(lit("http://"), src, lit(".example.org"), path))
  }

  /** The per-doc synthesized URL (variant = doc_id % 6). */
  def synthUrl(docId: Column, src: Column): Column =
    variantUrl((docId % 6).cast("int"), docId, src)

  /** SQL twin of [[variantUrl]] over an expression for v. */
  private def variantUrlSql(v: String): String =
    s"""CASE $v
       |  WHEN 0 THEN 'https://www.' || source || '.example.org/docs/' || doc_id
       |  WHEN 1 THEN 'HTTP://WWW.' || upper(source) || '.EXAMPLE.ORG:80/docs/' || doc_id || '/'
       |  WHEN 2 THEN 'https://www.' || source || '.example.org:443/docs/' || doc_id || '?utm_source=feed&utm_campaign=c'
       |  WHEN 3 THEN 'http://www.' || source || '.example.org/docs/' || doc_id || '?id=7&utm_medium=email&ref=x#frag'
       |  WHEN 4 THEN 'https://www.' || source || '.example.org/docs/' || doc_id || '?a=1&b=2'
       |  ELSE 'http://' || source || '.example.org/docs/' || doc_id
       |END""".stripMargin.replaceAll("\n\\s*", " ")

  /** SQL twin of [[synthUrl]] (reads `doc_id`, `source`). */
  val synthUrlSql: String = variantUrlSql("CAST(doc_id % 6 AS INT)")

  /** URL minus its scheme. */
  private def rest(url: Column): Column =
    regexp_replace(url, SchemeRe, "")

  /** Canonical host: lowercase, default ports and `www.` stripped. */
  def canonicalHost(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(rest(url), "^([^/?#]+)", 1)),
        ":(80|443)$", ""),
      "^www\\.", "")

  /** Canonical path: one trailing slash stripped (root → empty). */
  private def canonicalPath(url: Column): Column =
    regexp_replace(regexp_extract(rest(url), "^[^/?#]+([^?#]*)", 1),
      "/$", "")

  /** Query string with tracking parameters dropped, order preserved.
    *
    * Pure regexp surgery (r17 — replaces the lambda `filter`, whose
    * HOF predicate never codegens and evaluated its child tree
    * interpreted): pad the query with `&` sentinels, then one global
    * replace removes every `&` that introduces a tracking segment OR
    * an empty segment — the `(?=&)` lookahead leaves the next
    * boundary in place so consecutive dropped segments collapse in a
    * single pass — and a final trim strips the sentinel boundary `&`s.
    * Segment-name semantics are [[TrackingParams]]' exactly (`utm_*`,
    * `ref`, `fbclid`, `gclid`, name-anchored, with or without a
    * value); the DuckDB oracle keeps its independent `list_filter`
    * formulation, so the gate re-proves the equivalence on every
    * fixture variant. */
  private def keptQuery(url: Column): Column =
    regexp_replace(
      regexp_replace(
        concat(lit("&"),
          regexp_extract(url, "^[^?#]*\\?([^#]*)", 1), lit("&")),
        "&(?:(?:utm_[^=&]*|ref|fbclid|gclid)(?:=[^&]*)?)?(?=&)", ""),
      "^&+|&+$", "")

  /** The full canonical URL. The query-string arm references
    * [[keptQuery]] exactly ONCE — `nullif(concat("?", kept), "?")`
    * folds the empty case without a second evaluation the CASE form
    * would pay. */
  def canonicalUrl(url: Column): Column =
    concat(lit("https://"), canonicalHost(url), canonicalPath(url),
      coalesce(nullif(concat(lit("?"), keptQuery(url)), lit("?")),
        lit("")))

  /** SQL twin of [[canonicalHost]] over a URL expression. */
  def canonicalHostSqlOf(url: String): String =
    s"""regexp_replace(regexp_replace(
       |  lower(regexp_extract(regexp_replace($url,
       |    '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]+)', 1)),
       |  ':(80|443)$$', ''), '^www\\.', '')""".stripMargin
      .replaceAll("\n\\s*", " ")

  /** SQL twin of [[canonicalUrl]] over a URL expression. */
  def canonicalUrlSqlOf(url: String): String = {
    val path =
      s"""regexp_replace(regexp_extract(regexp_replace($url,
         |  '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
         |  '^[^/?#]+([^?#]*)', 1), '/$$', '')""".stripMargin
        .replaceAll("\n\\s*", " ")
    // DuckDB's array_to_string([]) is NULL, not '' — coalesce, or every
    // query-free URL's canonical form nulls out through ||
    val kept =
      s"""coalesce(array_to_string(list_filter(string_split(
         |  regexp_extract($url, '^[^?#]*\\?([^#]*)', 1), '&'),
         |  x -> NOT regexp_matches(x, '$TrackingParams')
         |       AND x <> ''), '&'), '')""".stripMargin
        .replaceAll("\n\\s*", " ")
    s"'https://' || ${canonicalHostSqlOf(url)} || $path || " +
      s"(CASE WHEN $kept = '' THEN '' ELSE '?' || $kept END)"
  }

  /** ORACLED CANONICALIZATION — per doc: the synthesized messy URL,
    * its canonical form and canonical host, graded against DuckDB
    * running the same regex/list pipeline independently. Every
    * doc_id % 6 variant class appears; a planted mix of scheme case,
    * www, default ports, trailing slashes, tracking params and
    * fragments must all fold. */
  def urlCanonical(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        synthUrl(col("doc_id"), col("source")).as("url"))
      .select(col("doc_id"), col("url"),
        canonicalUrl(col("url")).as("canon_url"),
        canonicalHost(col("url")).as("host"))

  /** URL-KEYED EXACT DEDUP — the planted twin regime: each doc appears
    * under TWO different junk variants (ids 2·doc_id / 2·doc_id+1,
    * variants rotating through the query-free classes {0,1,2,5}), raw
    * URLs always byte-different, canonical URLs always equal. One row
    * per canonical URL: representative id, member count, distinct raw
    * forms — every group must be a caught pair (n_raw = 2), which the
    * oracle recomputes from the same planted structure.
    *
    * Scale shape: hash-groupBy on the canonical key (the exact-dedup
    * shuffle); the canonicalization rides in the scan projection. */
  def urlKeyDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    // variant classes whose canonical form carries no query string —
    // any two of them collapse
    def cls(k: Column): Column =
      when(k === 0, lit(0)).when(k === 1, lit(1))
        .when(k === 2, lit(2)).otherwise(lit(5))
    val corpus = base.select((col("doc_id") * 2).as("id"),
        variantUrl(cls(col("doc_id") % 4), col("doc_id"), col("source"))
          .as("url"))
      .unionAll(base.select((col("doc_id") * 2 + 1).as("id"),
        variantUrl(cls((col("doc_id") + 1) % 4), col("doc_id"),
          col("source")).as("url")))
    corpus
      .groupBy(canonicalUrl(col("url")).as("canon_url"))
      .agg(min(col("id")).as("rep_id"),
        count(lit(1)).as("n_members"),
        countDistinct(col("url")).as("n_raw"))
      .select(col("canon_url"), col("rep_id"), col("n_members"),
        col("n_raw"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_canonical" -> (urlCanonical(_, _)),
    "q_url_key_dedup" -> (urlKeyDedup(_, _)))

  private val clsSql =
    "CASE WHEN %s IN (0, 1, 2) THEN %s ELSE 5 END"

  def oracles: Map[String, String] = Map(
    "q_url_canonical" ->
      s"""WITH u AS (SELECT doc_id, $synthUrlSql AS url FROM documents)
         |SELECT doc_id, url,
         |  ${canonicalUrlSqlOf("url")} AS canon_url,
         |  ${canonicalHostSqlOf("url")} AS host
         |FROM u""".stripMargin,
    "q_url_key_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id * 2 AS id,
         |    ${variantUrlSql(clsSql.format(
               "CAST(doc_id % 4 AS INT)", "CAST(doc_id % 4 AS INT)"))}
         |      AS url
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id * 2 + 1 AS id,
         |    ${variantUrlSql(clsSql.format(
               "CAST((doc_id + 1) % 4 AS INT)",
               "CAST((doc_id + 1) % 4 AS INT)"))} AS url
         |  FROM documents)
         |SELECT ${canonicalUrlSqlOf("url")} AS canon_url,
         |  min(id) AS rep_id,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw
         |FROM corpus GROUP BY 1""".stripMargin)
}
