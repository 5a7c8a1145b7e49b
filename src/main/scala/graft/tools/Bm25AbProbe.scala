package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B probe for the r19 retrievalEval lexical-arm rewrite:
  * arm A is the r18 shape (per-term single-term [[graft.operators.TextOps.bm25Scored]]
  * calls unioned — 2 corpus passes per term), arm B the multi-term
  * [[graft.operators.TextOps.bm25ScoredPerTerm]] (2 passes total, stack
  * unpivot). Arms alternate within one session so host drift hits both;
  * odd rep count so the median is a true order statistic (ADVICE r18).
  *
  *   runMain graft.tools.Bm25AbProbe [sfDir]
  */
object Bm25AbProbe {
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
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val terms = (0 until 5).map(q => s"zq$q")
    def armA(): DataFrame = terms.zipWithIndex.map { case (t, q) =>
      graft.operators.TextOps.bm25Scored(docs, Seq(t))
        .where(col("bm25_x8") > 0)
        .select(lit(q).as("q"), col("doc_id"), col("bm25_x8").as("score"))
    }.reduce(_.unionByName(_))
    def armB(): DataFrame =
      graft.operators.TextOps.bm25ScoredPerTerm(docs, terms)
        .where(col("bm25_x8") > 0)
        .select(col("term_idx").as("q"), col("doc_id"),
          col("bm25_x8").as("score"))
    // untimed warmup of both arms (codegen)
    Seq(armA(), armB()).foreach { d =>
      d.write.format("noop").mode("overwrite").save(); release(spark)
    }
    val reps = 9
    val (ta, tb) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    (0 until reps).foreach { i =>
      Seq(("A", armA _, ta), ("B", armB _, tb)).foreach {
        case (_, mk, ts) =>
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          ts(i) = (System.nanoTime() - t0) / 1e9
          release(spark)
      }
    }
    def stats(ts: Array[Double]): String =
      f"min ${ts.min}%.3f med ${ts.sorted.apply(reps / 2)}%.3f max ${ts.max}%.3f"
    println(s"[bm25ab] A(per-term union): ${stats(ta)}")
    println(s"[bm25ab] B(multi-term stack): ${stats(tb)}")
    spark.stop()
  }
}
