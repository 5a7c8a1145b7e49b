package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B probe for the r19 zorderIncremental candidate: the
  * keyed relation (events scan + min/max census + scaling projection)
  * feeds ~10 subtrees (4 boxes calls, their fileOf histograms, the
  * matched-rows census); arm A re-derives it per subtree (shipped r18
  * shape), arm B eagerly checkpoints it once. Odd reps, alternating.
  *
  *   runMain graft.tools.ZorderAbProbe [sfDir]
  */
object ZorderAbProbe {
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
    import graft.operators.LayoutOps
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def armA() = LayoutOps.zorderIncrementalOf(
      LayoutOps.keyedEvents(spark, sfDir))
    def armB() = LayoutOps.zorderIncrementalOf(
      LayoutOps.keyedEvents(spark, sfDir).localCheckpoint(true))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    require(rows(armA()) == rows(armB()), "results differ")
    release()
    println("[zorder] parity ok")
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
    println(s"[zorder] A(re-derive per subtree): ${stats(ta)}")
    println(s"[zorder] B(checkpoint once):       ${stats(tb)}")
    spark.stop()
  }
}
