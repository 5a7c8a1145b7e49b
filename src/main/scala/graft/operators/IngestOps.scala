package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Derived
import graft.sources.Tables

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

  /** Path templating — P5 (save:180-184): substitute metadata columns into
    * an archive directory pattern. */
  def pathTemplate(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        format_string("/archive/%s/%s/part_%06d.parquet",
          regexp_replace(col("p_brand"), " ", "_"),
          regexp_replace(col("p_type"), " ", "_"),
          col("p_partkey")).as("archive_path"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ingest_names"  -> ingestNames _,
    "q_path_template" -> pathTemplate _,
  )

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
    "q_path_template" ->
      """SELECT p_partkey,
        |  printf('/archive/%s/%s/part_%06d.parquet',
        |    replace(p_brand, ' ', '_'), replace(p_type, ' ', '_'),
        |    p_partkey) AS archive_path
        |FROM part""".stripMargin,
  )
}
