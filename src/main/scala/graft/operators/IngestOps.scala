package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Derived
import graft.sources.{KeywordContract, Tables}

/** Ingest-side projection/derivation operators (SURVEY.md §2.2) exercised
  * as batch queries over the testdata: filename synthesis and parsing,
  * notify↔payload pairing keys, filetype classification, quarantine
  * naming, date partitioning, and path templating. The streaming E1
  * pipeline itself lives in [[graft.streaming.IngestPipeline]]; these
  * queries pin down the expression semantics against the DuckDB oracle.
  */
object IngestOps {

  /** Filename round-trip + classification + quarantine naming — P1, S3,
    * P6/P7/P8, P15/P16 composed over events as the synthetic file stream:
    * raw FITS deliveries for most events, SNe manifests for signups. */
  def ingestNames(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("delivery_name",
        when(col("event_type") === "signup",
          concat(lit("manifest_SN"), col("event_id"), lit(".json")))
          .otherwise(Derived.decamNameOf(col("event_id"))))
      .withColumn("notify_name", concat(col("delivery_name"), lit(".dbb")))
      .select(col("event_id"),
        col("delivery_name"),
        (Derived.payloadNameOf(col("notify_name")) === col("delivery_name"))
          .as("pairing_ok"),
        Derived.filetypeOf(col("delivery_name")).as("filetype"),
        Derived.expnumOf(col("delivery_name")).as("expnum"),
        Derived.uniqName(col("delivery_name"), col("ts")).as("quarantine_name"),
        Derived.yearMonthOf(col("ts")).as("year_month"))

  /** Path templating — P5/J3 (save:180-184, 342-343): archive directory
    * patterns live in a DIM TABLE keyed by type (the reference's
    * OPS_DIRECTORY_PATTERN keyed by `dirpat_<filetype>`), broadcast-joined
    * to the facts; `${var}` tokens are substituted from a per-row metadata
    * map by the generic [[Derived.interpolate]] fold. Changing an archive
    * layout is now a table edit, not a recompile. */
  def pathTemplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val patterns = Seq(
      "ECONOMY"  -> "/archive/${type}/${brand}/part_${key6}.parquet",
      "STANDARD" -> "/archive/${type}/${brand}/part_${key6}.parquet",
      "MEDIUM"   -> "/archive/${type}/${brand}/part_${key6}.parquet",
      "PROMO"    -> "/promo/${brand}/part_${key6}.parquet",
      "LARGE"    -> "/archive/sized/${type}/part_${key6}.parquet",
      "SMALL"    -> "/archive/sized/${type}/part_${key6}.parquet",
    ).toDF("p_type", "pattern")
    val meta = map(
      lit("type"), col("p_type"),
      lit("brand"), regexp_replace(col("p_brand"), "#", "_"),
      lit("key6"), format_string("%06d", col("p_partkey")))
    Tables.part(spark, dir)
      .join(broadcast(patterns), Seq("p_type"))
      .select(col("p_partkey"),
        graft.functions.Derived.interpolate(col("pattern"), meta)
          .as("archive_path"))
  }

  /** Keyword-contract validation — P4 (save:158,212-215 driven by
    * etc/decam_src_keywords.txt): the 264-row contract table
    * ([[KeywordContract]]) supplies the per-HDU required sets; the check
    * is a LEFT ANTI join of contract-required keys vs parsed header keys,
    * per HDU flag (hdu 0 ⇒ primary R-flags, hdus 1-2 ⇒ extension
    * R-flags). Header parses are synthesized deterministically from
    * events — keyword k is present in HDU h of event e unless
    * hex digit `i` of md5(e|h) is '0', where `i` is the keyword's index
    * in the required list (~1/16 dropout; the lists fit the 32-digit
    * md5) — so the whole pipeline is oracle-able; the ingest pipeline
    * runs the identical set difference row-locally over real FITS bytes
    * (IngestPipeline stage 6).
    *
    * Scale shape: the required-keyword sets are driver-side constants
    * (the degenerate-but-optimal broadcast of a 264-row dim), so the
    * whole validation is a per-row `filter` over a literal array —
    * ZERO shuffles, linear in events, ONE md5 per (event, hdu). Two
    * earlier formulations were each an order slower: an events x 59
    * expected relation anti-joined against its own filtered copy (two
    * exchanges of 59x the fact rows, 5.4 s at sf0.01), then a row-local
    * variant hashing per (event, hdu, KEYWORD) — 59 md5s/row, ~6 s at
    * sf0.1. The anti-join SHAPE still matters when the present set comes
    * from a separate relation (real parsed headers) — that is
    * IngestPipeline stage 6's job, not this query's. */
  def keywordContract(spark: SparkSession, dir: String): DataFrame = {
    // the per-HDU hash is a named column so it is computed ONCE per row:
    // inlining it into the 59 keyword probes would re-evaluate the md5
    // per probe (no CSE inside the interpreted array tree; CollapseProject
    // keeps a multiply-referenced non-cheap alias materialized)
    def hduHash(hdu: Int) =
      md5(concat_ws("|", col("event_id"), lit(hdu)).cast("binary"))
    def missingIn(h: org.apache.spark.sql.Column, req: Seq[String]) =
      filter(array(req.zipWithIndex.map { case (k, i) =>
        when(substring(h, i + 1, 1) === "0", lit(k))
      }: _*), x => x.isNotNull)
    // fan-out before the per-row hash + keyword-probe arrays — identity
    // at scale (see ScaleUtils.fanOutScan)
    graft.functions.ScaleUtils.fanOutScan(
        Tables.events(spark, dir).select(col("event_id")), col("event_id"))
      .withColumn("h0", hduHash(0))
      .withColumn("h1", hduHash(1))
      .withColumn("h2", hduHash(2))
      .withColumn("mp", missingIn(col("h0"), KeywordContract.requiredPrimary))
      .withColumn("me",
        concat(missingIn(col("h1"), KeywordContract.requiredExtension),
          missingIn(col("h2"), KeywordContract.requiredExtension)))
      .select(col("event_id"),
        size(col("mp")).cast("long").as("n_missing_primary"),
        size(col("me")).cast("long").as("n_missing_ext"),
        array_join(array_sort(array_distinct(concat(col("mp"), col("me")))), ",")
          .as("missing_keywords"),
        (size(col("mp")) + size(col("me")) === 0).as("valid"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ingest_names"     -> ingestNames _,
    "q_path_template"    -> pathTemplate _,
    "q_keyword_contract" -> keywordContract _,
  )

  /** (index, keyword) VALUES rows for an indexed required-keyword list. */
  private def indexedValues(req: Seq[String]): String =
    req.zipWithIndex.map { case (k, i) => s"($i,'$k')" }
      .grouped(8).map(_.mkString(",")).mkString(",\n    ")

  val oracles: Map[String, String] = Map(
    "q_ingest_names" ->
      """WITH named AS (
        |  SELECT event_id, ts,
        |    CASE WHEN event_type = 'signup'
        |      THEN 'manifest_SN' || event_id || '.json'
        |      ELSE printf('DECam_%08d.fits.fz', event_id) END AS delivery_name
        |  FROM events)
        |SELECT event_id, delivery_name,
        |  regexp_replace(delivery_name || '.dbb', '\.dbb$', '') = delivery_name
        |    AS pairing_ok,
        |  CASE WHEN delivery_name LIKE '%.fits'
        |         OR delivery_name LIKE '%.fits.fz' THEN 'raw'
        |       WHEN delivery_name LIKE 'manifest\_SN%' ESCAPE '\'
        |         AND delivery_name LIKE '%.json' THEN 'snmanifest'
        |       ELSE NULL END AS filetype,
        |  CAST(nullif(regexp_extract(delivery_name,
        |    'DECam_(\d+)\.fits\.fz', 1), '') AS BIGINT) AS expnum,
        |  delivery_name || '.' || strftime(ts, '%Y%m%d%H%M%S')
        |    || left(strftime(ts, '%f'), 3) AS quarantine_name,
        |  strftime(ts, '%Y/%m') AS year_month
        |FROM named""".stripMargin,
    // chained replace over the (known) metadata keys is the SQL rendering
    // of the generic map-fold interpolation; a ${var} absent from the
    // pattern makes that replace a no-op in both engines.
    "q_path_template" ->
      """WITH patterns(p_type, pattern) AS (VALUES
        |  ('ECONOMY',  '/archive/${type}/${brand}/part_${key6}.parquet'),
        |  ('STANDARD', '/archive/${type}/${brand}/part_${key6}.parquet'),
        |  ('MEDIUM',   '/archive/${type}/${brand}/part_${key6}.parquet'),
        |  ('PROMO',    '/promo/${brand}/part_${key6}.parquet'),
        |  ('LARGE',    '/archive/sized/${type}/part_${key6}.parquet'),
        |  ('SMALL',    '/archive/sized/${type}/part_${key6}.parquet'))
        |SELECT p_partkey,
        |  replace(replace(replace(pattern,
        |    '${type}', p_type),
        |    '${brand}', replace(p_brand, '#', '_')),
        |    '${key6}', printf('%06d', p_partkey)) AS archive_path
        |FROM part JOIN patterns USING (p_type)""".stripMargin,
    // indexed required lists share their single source of truth with the
    // Spark side (KeywordContract.required*, file order, deduped)
    "q_keyword_contract" ->
      s"""WITH reqp(i, keyword) AS (VALUES
         |    ${indexedValues(KeywordContract.requiredPrimary)}),
         |reqe(i, keyword) AS (VALUES
         |    ${indexedValues(KeywordContract.requiredExtension)}),
         |ev AS (
         |  SELECT event_id,
         |    md5(CAST(event_id AS VARCHAR) || '|0') AS h0,
         |    md5(CAST(event_id AS VARCHAR) || '|1') AS h1,
         |    md5(CAST(event_id AS VARCHAR) || '|2') AS h2
         |  FROM events),
         |missing AS (
         |  SELECT event_id, 0 AS hdu, keyword
         |  FROM ev JOIN reqp ON substr(h0, CAST(i + 1 AS INT), 1) = '0'
         |  UNION ALL
         |  SELECT event_id, 1 AS hdu, keyword
         |  FROM ev JOIN reqe ON substr(h1, CAST(i + 1 AS INT), 1) = '0'
         |  UNION ALL
         |  SELECT event_id, 2 AS hdu, keyword
         |  FROM ev JOIN reqe ON substr(h2, CAST(i + 1 AS INT), 1) = '0'),
         |agg AS (
         |  SELECT event_id,
         |    CAST(sum(CASE WHEN hdu = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_primary,
         |    CAST(sum(CASE WHEN hdu > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_ext,
         |    array_to_string(list_sort(list_distinct(list(keyword))), ',') AS missing_keywords
         |  FROM missing GROUP BY event_id)
         |SELECT e.event_id,
         |  coalesce(a.n_missing_primary, 0) AS n_missing_primary,
         |  coalesce(a.n_missing_ext, 0) AS n_missing_ext,
         |  coalesce(a.missing_keywords, '') AS missing_keywords,
         |  a.missing_keywords IS NULL AS valid
         |FROM events e LEFT JOIN agg a ON e.event_id = a.event_id""".stripMargin,
  )
}
