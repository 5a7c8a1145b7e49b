package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B/C probe for the r19 urlDupDrops candidates: the
  * URL synthesis + canonicalization projection (6 regexes + an
  * interpreted HOF filter per row) feeds both sides of the
  * keep-min self-join. A = shipped shape (projection computed twice,
  * tiny agg side broadcast back). B = one shared exchange
  * (repartition by canon_url; agg and join reuse the partitioning, the
  * projection runs once). C = window min over canon_url. All
  * row-identical; odd reps, alternating.
  *
  *   runMain graft.tools.UrlDropAbProbe [sfDir]
  */
object UrlDropAbProbe {
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
    import graft.operators.CurationOps
    import graft.sources.Tables
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def canon: DataFrame = CurationOps
      .urlDocsForProbe(Tables.documents(spark, sfDir))
      .select(col("doc_id"),
        CurationOps.canonicalizeUrl(col("url")).as("canon_url"))
    def armA(): DataFrame = {
      val c = canon
      c.join(c.groupBy(col("canon_url"))
          .agg(min(col("doc_id")).as("keep_id")), Seq("canon_url"))
        .where(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"))
    }
    def armB(): DataFrame = {
      val c = canon.repartition(col("canon_url"))
      c.join(c.groupBy(col("canon_url"))
          .agg(min(col("doc_id")).as("keep_id")), Seq("canon_url"))
        .where(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"))
    }
    def armC(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("canon_url"))
      canon.withColumn("keep_id", min(col("doc_id")).over(w))
        .where(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"))
    }
    val a0 = armA().collect().map(_.getLong(0)).sorted.toSeq
    require(armB().collect().map(_.getLong(0)).sorted.toSeq == a0, "B differs")
    require(armC().collect().map(_.getLong(0)).sorted.toSeq == a0, "C differs")
    println(s"[urldrop] parity ok over ${a0.size} dropped ids")
    val arms = Seq("A(double projection)" -> (armA _),
      "B(shared exchange)  " -> (armB _),
      "C(window min)       " -> (armC _))
    val reps = 9
    val ts = arms.map(_ => Array.ofDim[Double](reps))
    (0 until reps).foreach { i =>
      arms.zipWithIndex.foreach { case ((_, mk), j) =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        ts(j)(i) = (System.nanoTime() - t0) / 1e9
        release()
      }
    }
    arms.zipWithIndex.foreach { case ((name, _), j) =>
      val t = ts(j)
      println(f"[urldrop] $name: min ${t.min}%.3f med ${t.sorted.apply(reps / 2)}%.3f max ${t.max}%.3f")
    }
    spark.stop()
  }
}
