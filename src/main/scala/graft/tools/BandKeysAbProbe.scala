package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B probe: the batch LSH signature pass as
  * explode+groupBy ([[graft.operators.DedupOps.bandKeys]], codegen'd
  * md5 over shingle ROWS + partial-agg mins) vs the per-row array form
  * ([[graft.operators.DedupOps.bandKeysPerRow]], interpreted HOF
  * transforms, no explode, no exchange). Semantics identical
  * (spec-pinned parity via the streaming gate suite); this decides
  * whether the batch chain should switch. Odd reps, alternating.
  *
  *   runMain graft.tools.BandKeysAbProbe [sfDir]
  */
object BandKeysAbProbe {
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
    import graft.operators.DedupOps
    import graft.sources.Tables
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val docs = Tables.documents(spark, sfDir)
    def armA() = DedupOps.bandKeys(spark, DedupOps.exploded(spark, sfDir))
      .select(col("doc_id"), col("band"), col("band_key"))
    def armB() = DedupOps.bandKeysPerRow(
      graft.functions.ScaleUtils.fanOutScan(docs, col("doc_id")))
    // parity (bandKeys also carries lang; compare the key triple)
    val a0 = armA().collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2))).toSet
    val b0 = armB().collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2))).toSet
    require(a0 == b0, s"band keys differ: ${a0.size} vs ${b0.size}")
    println(s"[bandkeys] parity ok over ${a0.size} (doc, band, key) rows")
    Seq(armA(), armB()).foreach { d =>
      d.write.format("noop").mode("overwrite").save(); release()
    }
    val reps = 9
    val (ta, tb) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    (0 until reps).foreach { i =>
      Seq((armA _, ta), (armB _, tb)).foreach { case (mk, ts) =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        ts(i) = (System.nanoTime() - t0) / 1e9
        release()
      }
    }
    def stats(ts: Array[Double]): String =
      f"min ${ts.min}%.3f med ${ts.sorted.apply(reps / 2)}%.3f max ${ts.max}%.3f"
    println(s"[bandkeys] A(explode+groupBy): ${stats(ta)}")
    println(s"[bandkeys] B(per-row arrays):  ${stats(tb)}")
    spark.stop()
  }
}
