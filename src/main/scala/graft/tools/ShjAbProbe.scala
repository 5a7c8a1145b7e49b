package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for spark.sql.join.preferSortMergeJoin (guide §3.1:
  * "allow shuffled hash join when it fits") on the SMJ-heaviest declared
  * queries. The conf is runtime-mutable, so both arms run in one session
  * with alternating reps. Usage: runMain graft.tools.ShjAbProbe <sfDir> q...
  */
object ShjAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_group_purity", "q_pagerank", "q_curation_funnel")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ta = scala.collection.mutable.ArrayBuffer.empty[Double]
      val tb = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 5).foreach { _ =>
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ta += (System.nanoTime() - t0) / 1e9
        release()
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        val t1 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        tb += (System.nanoTime() - t1) / 1e9
        release()
      }
      println(f"[ab] $name%-22s smj: min ${ta.min}%.3f med ${ta.sorted.apply(2)}%.3f | shj: min ${tb.min}%.3f med ${tb.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
