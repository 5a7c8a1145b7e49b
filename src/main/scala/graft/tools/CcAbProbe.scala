package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the one-aggregate connected-components step
  * (r18): arm A replays the pre-rewrite loop (nbrMin join+agg, then a
  * second labels join), arm B is the shipped [[graft.operators.DedupOps
  * .connectedComponents]]. Both run over the same checkpointed LSH dup
  * edges; reps alternate so host drift hits both arms. Also asserts the
  * two labelings are identical before timing.
  * Usage: runMain graft.tools.CcAbProbe <sfDir> */
object CcAbProbe {
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

    def ccOld(edges: DataFrame, maxIters: Int = 50): DataFrame = {
      val e = edges.select(col("id_a"), col("id_b")).localCheckpoint(true)
      val adj = e.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      var labels = adj.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id"))
      var converged = false
      var it = 0
      while (!converged && it < maxIters) {
        val nbrMin = adj
          .join(labels.select(col("id").as("src"), col("comp").as("src_comp")),
            Seq("src"))
          .groupBy(col("dst").as("id")).agg(min(col("src_comp")).as("nbr_min"))
        val stepped = labels
          .join(nbrMin, Seq("id"), "left_outer")
          .select(col("id"), col("comp").as("old_comp"),
            least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
          .localCheckpoint(true)
        converged = stepped.where(col("comp") =!= col("old_comp")).isEmpty
        labels = stepped.select(col("id"), col("comp"))
        it += 1
      }
      labels
    }

    def edges = graft.operators.DedupOps.textDupPairs(spark, sfDir)
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // parity check first
    val a0 = ccOld(edges).orderBy("id").collect().map(_.toSeq)
    release()
    val b0 = DedupOps.connectedComponents(edges).orderBy("id").collect()
      .map(_.toSeq)
    release()
    require(a0.toSeq == b0.toSeq,
      s"labelings differ: old ${a0.length} rows vs new ${b0.length}")
    println(s"[ab] parity: ${a0.length} labeled nodes identical")

    val ta = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tb = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to 6).foreach { _ =>
      val t0 = System.nanoTime()
      ccOld(edges).write.format("noop").mode("overwrite").save()
      ta += (System.nanoTime() - t0) / 1e9
      release()
      val t1 = System.nanoTime()
      DedupOps.connectedComponents(edges)
        .write.format("noop").mode("overwrite").save()
      tb += (System.nanoTime() - t1) / 1e9
      release()
    }
    println(f"[ab] two-join step: min ${ta.min}%.3f med ${ta.sorted.apply(3)}%.3f")
    println(f"[ab] one-agg  step: min ${tb.min}%.3f med ${tb.sorted.apply(3)}%.3f")
    spark.stop()
  }
}
