package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the dedup spine and the funnel's
  * corpus-level signals — the guide-§1 "measure first" breakdown behind
  * the r18 optimization round: ~15 of the top-cost declared queries
  * re-derive the same LSH → verify → components chain, so the chain's
  * internal split (tokenize/shingle explode, signature aggregation, band
  * self-join, exact-Jaccard verify, min-label loop) decides where the
  * optimization budget goes. Each stage runs cold then warm (×2) through
  * the noop sink with the Bench release discipline between reps.
  *
  *   runMain graft.tools.SpineProbe /root/testdata/sf0.1
  */
object SpineProbe {
  private def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    import graft.operators.{DedupOps, TextOps, CurationOps}
    import graft.sources.Tables

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "scan_documents" -> (() => Tables.documents(spark, sfDir)),
      "exploded" -> (() => DedupOps.exploded(spark, sfDir)),
      "bandKeys" -> (() => DedupOps.bandKeys(spark,
        DedupOps.exploded(spark, sfDir))),
      "cand_pairs" -> (() => {
        val bk = DedupOps.bandKeys(spark, DedupOps.exploded(spark, sfDir))
        bk.as("a").join(bk.as("b"),
            col("a.band") === col("b.band") &&
              col("a.band_key") === col("b.band_key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
      }),
      "cand_scores" -> (() => DedupOps.textCandidateScores(spark, sfDir)),
      "dup_pairs" -> (() => DedupOps.textDupPairs(spark, sfDir)),
      "dedup_groups" -> (() => DedupOps.textDedupGroups(spark, sfDir)),
      "quality_score" -> (() => TextOps.qualityScore(spark, sfDir)),
      "chunk_docs" -> (() => CurationOps.chunkDocs(spark, sfDir)),
      "contamination" -> (() => DedupOps.contamination(spark, sfDir)),
      "ngram_contamination" -> (() => DedupOps.ngramContamination(spark, sfDir)),
      "boilerplate" -> (() => TextOps.boilerplate(spark, sfDir)))

    stages.foreach { case (name, mk) =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        println(f"[spine] $name%-22s run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        release(spark)
      }
    }
    spark.stop()
  }
}
