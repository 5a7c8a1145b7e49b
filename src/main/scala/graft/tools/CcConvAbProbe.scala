package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B probe for the r19 CC convergence-check CANDIDATE
  * (measured and REJECTED): arm A is the shipped
  * [[graft.operators.DedupOps.connectedComponents]] (per-iteration
  * `where(changed).isEmpty` — take(1) finds a changed row in its first
  * 1-partition wave while iterating, and only the terminal pass pays
  * the limit scale-up waves), arm B the candidate one-max-aggregate-job
  * check (pays a full 2-stage job EVERY iteration — measured worse:
  * min 0.781/med 0.995 s vs 0.937/1.092). Both run over the SAME
  * pre-checkpointed dup-pair edge list so only the loop is timed; arms
  * alternate within one session so host drift hits both; odd reps. Also
  * parity-checks the two labelings once.
  *
  *   runMain graft.tools.CcConvAbProbe [sfDir]
  */
object CcConvAbProbe {
  /** The REJECTED candidate loop (max-aggregate convergence), kept here
    * as the B arm so the measurement stays reproducible. */
  private def ccAggCheck(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    def checkpointed(df: DataFrame)
        : (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
      val out = df.localCheckpoint(true)
      (out, out.queryExecution.logical.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd })
    }
    val (e, eRdds) = checkpointed(edges.select(col("id_a"), col("id_b")))
    try {
      val adj = e.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      var labels = adj.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id"))
      var prevRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
      var converged = false
      var it = 0
      while (!converged && it < maxIters) {
        val nbrMin = adj
          .join(labels.select(col("id").as("src"), col("comp").as("src_comp")),
            Seq("src"))
          .groupBy(col("dst").as("id")).agg(min(col("src_comp")).as("nbr_min"))
        val (stepped, newRdds) = checkpointed(labels
          .join(nbrMin, Seq("id"), "left_outer")
          .select(col("id"), col("comp").as("old_comp"),
            least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp")))
        converged = !stepped
          .agg(coalesce(max(col("comp") =!= col("old_comp")), lit(false)))
          .head.getBoolean(0)
        labels = stepped.select(col("id"), col("comp"))
        prevRdds.foreach(_.unpersist(false))
        prevRdds = newRdds
        it += 1
      }
      require(converged, "ccAggCheck did not converge")
      labels
    } finally eRdds.foreach(_.unpersist(false))
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
    // edges materialized ONCE outside the timed arms (only the loop is
    // under test, not the LSH chain)
    val edges = graft.operators.DedupOps
      .textDupPairs(spark, sfDir).localCheckpoint(true)
    val edgeRddIds = edges.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    // parity: identical labelings
    val a0 = graft.operators.DedupOps.connectedComponents(edges)
      .orderBy("id").collect().toSeq
    val b0 = ccAggCheck(edges).orderBy("id").collect().toSeq
    require(a0 == b0, s"labelings differ: ${a0.size} vs ${b0.size}")
    println(s"[ccconv] parity ok over ${a0.size} labeled nodes")
    val reps = 9
    val (ta, tb) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    (0 until reps).foreach { i =>
      Seq((() => graft.operators.DedupOps.connectedComponents(edges), ta),
        (() => ccAggCheck(edges), tb))
        .foreach { case (mk, ts) =>
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          ts(i) = (System.nanoTime() - t0) / 1e9
          // keep the shared edge checkpoint; release only what the arms
          // themselves left (the final labels checkpoint)
          spark.sparkContext.getPersistentRDDs.values
            .filterNot(r => edgeRddIds(r.id))
            .foreach(_.unpersist(blocking = true))
        }
    }
    def stats(ts: Array[Double]): String =
      f"min ${ts.min}%.3f med ${ts.sorted.apply(reps / 2)}%.3f max ${ts.max}%.3f"
    println(s"[ccconv] A(isEmpty check): ${stats(ta)}")
    println(s"[ccconv] B(max-agg check): ${stats(tb)}")
    spark.stop()
  }
}
