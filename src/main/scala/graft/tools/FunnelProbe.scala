package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the curation funnel's signal relations
  * (the r19 complement to [[SpineProbe]]): q_curation_funnel and
  * q_release_risk are sums of ~8 corpus-level signals, so the split
  * decides where the budget goes. Cold then warm ×3 through the noop
  * sink with the Bench release discipline.
  *
  *   runMain graft.tools.FunnelProbe /root/testdata/sf0.1
  */
object FunnelProbe {
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

    import graft.operators.{CurationOps, DedupOps, TextOps}
    import graft.sources.Tables

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "groups+keep+drop" -> (() => {
        val groups = DedupOps.textDedupGroups(spark, sfDir)
        val keep = DedupOps.canonicalDocsFrom(groups,
          TextOps.qualityScore(spark, sfDir)
            .select(col("doc_id"), col("quality")))
        DedupOps.dropList(groups, keep)
      }),
      "contamination" -> (() => DedupOps.contamination(spark, sfDir)),
      "ngram_contamination" ->
        (() => DedupOps.ngramContamination(spark, sfDir)),
      "boilerplate" -> (() => TextOps.boilerplate(spark, sfDir)),
      "chunk_docs" -> (() => CurationOps.chunkDocs(spark, sfDir)),
      "chunk_contamination" -> (() =>
        CurationOps.chunkContaminationOf(CurationOps.chunkDocs(spark, sfDir))),
      "chunk_dedup" -> (() =>
        CurationOps.chunkDedupOf(CurationOps.chunkDocs(spark, sfDir))),
      "url_dup_drops" -> (() => CurationOps.urlDupDrops(spark, sfDir)),
      "stages_full" -> (() => {
        val groups = DedupOps.textDedupGroups(spark, sfDir)
        val keep = DedupOps.canonicalDocsFrom(groups,
          TextOps.qualityScore(spark, sfDir)
            .select(col("doc_id"), col("quality")))
        CurationOps.curationStagesFrom(spark, sfDir,
          DedupOps.dropList(groups, keep))
      }))

    stages.foreach { case (name, mk) =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        println(f"[funnel] $name%-22s run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        release(spark)
      }
    }
    spark.stop()
  }
}
