package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the band-key self-join exchange-reuse rewrite
  * (r18): arm A self-joins the signature relation WITHOUT a trailing
  * repartition (the planner broadcasts one side, deriving the signature
  * pass twice); arm B repartitions on the join key first (both sides
  * share one exchange). Reps alternate so host drift hits both arms.
  * Usage: runMain graft.tools.BandJoinAbProbe <sfDir> */
object BandJoinAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    import graft.operators.DedupOps
    val ex = DedupOps.exploded(spark, sfDir)
    // arm A rebuilds the PRE-rewrite bandKeys (no trailing repartition)
    // inline, so its self-join plans exactly like the old form
    def bandKeysOld: DataFrame = {
      val prefixes = (0 to 2).map(DedupOps.hashPrefix)
      val withH = prefixes.zipWithIndex.foldLeft(ex) { case (df, (p, i)) =>
        df.withColumn(s"h$i", md5(concat(lit(p), col("tok")).cast("binary")))
      }
      val minExprs = (0 until DedupOps.NumHashes).map { s =>
        min(substring(col(s"h${s / 4}"), (s % 4) * 8 + 1, 8)).as(s"m$s")
      }
      val mh = withH.groupBy(col("doc_id"), col("lang"))
        .agg(minExprs.head, minExprs.tail: _*)
      val nBands = DedupOps.NumHashes / DedupOps.BandSize
      val bandCols = (0 until nBands).map { b =>
        val slice = (0 until DedupOps.BandSize)
          .map(i => col(s"m${b * DedupOps.BandSize + i}"))
        md5(concat_ws(",", slice: _*).cast("binary")).as(s"bk$b")
      }
      val stackArgs = (0 until nBands).map(b => s"$b, bk$b").mkString(", ")
      mh.select(col("doc_id") +: col("lang") +: bandCols: _*)
        .select(col("doc_id"), col("lang"),
          expr(s"stack($nBands, $stackArgs) as (band, band_key)"))
    }
    val bkB = DedupOps.bandKeys(spark, ex)
    def cand(bk1: DataFrame, bk2: DataFrame): DataFrame = bk1.as("a")
      .join(bk2.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    def armA: DataFrame = cand(bandKeysOld, bandKeysOld)
    def armB: DataFrame = cand(bkB, bkB)
    val ta = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tb = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to 7).foreach { _ =>
      val t0 = System.nanoTime()
      armA.write.format("noop").mode("overwrite").save()
      ta += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      armB.write.format("noop").mode("overwrite").save()
      tb += (System.nanoTime() - t1) / 1e9
    }
    println(f"[ab] broadcast-2pass: min ${ta.min}%.3f med ${ta.sorted.apply(3)}%.3f")
    println(f"[ab] shared-exchange: min ${tb.min}%.3f med ${tb.sorted.apply(3)}%.3f")
    spark.stop()
  }
}
