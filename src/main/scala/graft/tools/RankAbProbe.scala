package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B probe for the r19 rank-loop driver cutover: arm A is
  * the distributed [[graft.operators.GraphOps.rankItersFrom]] iteration
  * (`driverMaxRows = 0`), arm B the shipped dispatch (driver recurrence
  * below the bound). Shared registry + edge relation built once (both
  * are checkpointed inside); arms alternate; odd reps. Parity is
  * spec-pinned in GraphOpsSpec and re-checked once here.
  *
  *   runMain graft.tools.RankAbProbe [sfDir]
  */
object RankAbProbe {
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
    import graft.operators.GraphOps
    val rk = GraphOps.srcRanks(spark, sfDir).localCheckpoint(true)
    val e = GraphOps.domainEdgesOf(GraphOps.docsWithDomain(spark, sfDir), rk)
      .localCheckpoint(true)
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    def lab(driverMaxRows: Int) =
      GraphOps.rankItersFrom(e, rk, driverMaxRows)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(lab(0) == lab(GraphOps.RankDriverMaxRows), "ranks differ")
    println("[rankab] parity ok")
    val reps = 9
    val (ta, tb) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    (0 until reps).foreach { i =>
      Seq((0, ta), (GraphOps.RankDriverMaxRows, tb)).foreach {
        case (bound, ts) =>
          val t0 = System.nanoTime()
          GraphOps.rankItersFrom(e, rk, bound)
            .write.format("noop").mode("overwrite").save()
          ts(i) = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs
            .filterNot { case (id, _) => keep(id) }
            .values.foreach(_.unpersist(blocking = true))
      }
    }
    def stats(ts: Array[Double]): String =
      f"min ${ts.min}%.3f med ${ts.sorted.apply(reps / 2)}%.3f max ${ts.max}%.3f"
    println(s"[rankab] A(distributed loop): ${stats(ta)}")
    println(s"[rankab] B(driver recurrence): ${stats(tb)}")
    spark.stop()
  }
}
