package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B probe for the explode-vs-explode_outer rewrite
  * (r18): times the plain-explode form against the explodeNN form of
  * the same token aggregation, alternating reps so host drift hits both
  * arms equally. Usage: runMain graft.tools.ExplodeAbProbe <sfDir> */
object ExplodeAbProbe {
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
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def toks = graft.operators.TextOps.toks(col("text"))

    def plain: DataFrame = docs
      .select(col("lang"), explode(toks).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang")).agg(sum(col("c")).as("n"), count(lit(1)).as("t"))
    def outer: DataFrame = graft.operators.TextOps
      .explodeNN(docs, toks, "tok", col("lang"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang")).agg(sum(col("c")).as("n"), count(lit(1)).as("t"))

    val ta = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tb = scala.collection.mutable.ArrayBuffer.empty[Double]
    // odd rep count so .apply(reps/2) is a TRUE median (ADVICE r18: 8
    // reps made element 4 the upper-middle order statistic, biased high)
    (1 to 9).foreach { i =>
      val t0 = System.nanoTime()
      plain.write.format("noop").mode("overwrite").save()
      ta += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      outer.write.format("noop").mode("overwrite").save()
      tb += (System.nanoTime() - t1) / 1e9
    }
    println(f"[ab] plain: min ${ta.min}%.3f med ${ta.sorted.apply(4)}%.3f")
    println(f"[ab] outer: min ${tb.min}%.3f med ${tb.sorted.apply(4)}%.3f")
    spark.stop()
  }
}
