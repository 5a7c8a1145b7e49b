package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.DotProductLong
import graft.sources.Tables

/** [EXT] Training-data curation pipeline — the composed shape a 100 TB
  * pretraining-data job runs: score text quality → filter → join the
  * embedding table on document id → summarize the surviving corpus per
  * quality bucket. Chains TextOps scoring with the vector path in one
  * plan; the doc↔embedding join is an equi-join on the shared id (both
  * sides co-partitionable by that key at scale).
  */
object CurationOps {

  def curationSummary(spark: SparkSession, dir: String): DataFrame = {
    val dot = DotProductLong.dotLong(spark) _
    val quality = TextOps.qualityScore(spark, dir) // doc_id, quality, bucket
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"),
        transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long"))
          .as("qe"))
      .withColumn("nrm", dot(col("qe"), col("qe")))
      .select(col("doc_id"), col("nrm"))
    quality.where(col("quality") >= 0.45)
      .join(docs, Seq("doc_id"))
      .join(emb, Seq("doc_id"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("nrm")).as("sum_nrm_milli"),
        // decimal sum (exact: quality has 4 decimals) then one double
        // division — engine-portable regardless of accumulation order
        round(sum(col("quality").cast("decimal(8,4)")).cast("double")
          / count(lit(1)), 4).as("avg_quality"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation" -> curationSummary _,
  )

  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"

  val oracles: Map[String, String] = Map(
    "q_curation" ->
      s"""WITH f AS (SELECT doc_id, lang,
         |  length($toksSql) AS n_tok,
         |  length(list_distinct($toksSql)) AS n_uniq,
         |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |  length(regexp_extract_all(text, '\\b(the|a|of|and|in|to)\\b')) AS n_stop
         |FROM documents),
         |q AS (SELECT doc_id, lang,
         |    CAST(q10k AS DOUBLE) / 10000.0 AS quality,
         |    CASE WHEN q10k >= 7000 THEN 'high'
         |         WHEN q10k >= 5000 THEN 'mid' ELSE 'low' END AS bucket
         |  FROM (SELECT doc_id, lang,
         |      (10 * (3 * least(n_tok, 100) * greatest(n_tok, 1)
         |             + 400 * n_uniq
         |             + 200 * (greatest(n_tok, 1) - least(n_punct, greatest(n_tok, 1)))
         |             + 100 * least(2 * n_stop, greatest(n_tok, 1))))
         |        // greatest(n_tok, 1) AS q10k
         |    FROM f)),
         |e AS (SELECT vec_id AS doc_id,
         |  list_dot_product(
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS nrm
         |FROM embeddings)
         |SELECT bucket,
         |  count(*) AS n_docs,
         |  count(DISTINCT lang) AS n_langs,
         |  CAST(sum(nrm) AS BIGINT) AS sum_nrm_milli,
         |  round(CAST(sum(CAST(quality AS DECIMAL(8,4))) AS DOUBLE) / count(*), 4)
         |    AS avg_quality
         |FROM q JOIN e USING (doc_id)
         |WHERE quality >= 0.45
         |GROUP BY 1""".stripMargin,
  )
}
