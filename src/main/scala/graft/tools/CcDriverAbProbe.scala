package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B probe for the r19 small-graph CC cutover: arm A is
  * the distributed min-label loop (`driverMaxEdges = 0`), arm B the
  * shipped dispatch (driver union-find below the bound). Both run over
  * the SAME pre-checkpointed dup-pair edge list; arms alternate within
  * one session; odd reps. Parity is spec-pinned (SamplingDedupSpec) and
  * re-checked here once.
  *
  *   runMain graft.tools.CcDriverAbProbe [sfDir]
  */
object CcDriverAbProbe {
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
    val edges = graft.operators.DedupOps
      .textDupPairs(spark, sfDir).localCheckpoint(true)
    val edgeRddIds = edges.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    def lab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(
      lab(graft.operators.DedupOps.connectedComponents(edges,
        driverMaxEdges = 0)) ==
      lab(graft.operators.DedupOps.connectedComponents(edges)),
      "labelings differ")
    println("[ccdriver] parity ok")
    val reps = 9
    val (ta, tb) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    (0 until reps).foreach { i =>
      Seq((() => graft.operators.DedupOps.connectedComponents(edges,
          driverMaxEdges = 0), ta),
        (() => graft.operators.DedupOps.connectedComponents(edges), tb))
        .foreach { case (mk, ts) =>
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          ts(i) = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs.values
            .filterNot(r => edgeRddIds(r.id))
            .foreach(_.unpersist(blocking = true))
        }
    }
    def stats(ts: Array[Double]): String =
      f"min ${ts.min}%.3f med ${ts.sorted.apply(reps / 2)}%.3f max ${ts.max}%.3f"
    println(s"[ccdriver] A(distributed loop): ${stats(ta)}")
    println(s"[ccdriver] B(driver union-find): ${stats(tb)}")
    spark.stop()
  }
}
