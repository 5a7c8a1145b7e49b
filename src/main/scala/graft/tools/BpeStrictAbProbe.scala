package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe for the r19 candidate "serve the 8-merge BPE family from the
  * STRICT-batched loop" (fewer driver round-trips when rounds admit >1
  * merge): reports the strict-batched ROUND count for [[graft.operators
  * .TextOps.BpeMergeIters]] merges at this sf, asserts merge-table
  * equality against the sequential loop, and interleaves the two loop
  * timings. If rounds ≈ merges (tiny whitespace alphabet → birthday-
  * bound batches), the candidate buys nothing — that number decides.
  *
  *   runMain graft.tools.BpeStrictAbProbe [sfDir]
  */
object BpeStrictAbProbe {
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
    import graft.operators.TextOps
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // equality + round count, once
    var rounds = 0
    val batched = TextOps.bpeLoopBatchedOver(docs, TextOps.BpeMergeIters,
      TextOps.BpeBatchCap, strict = true, onRound = _ => rounds += 1)
    release()
    val (seq0, _, base) = TextOps.bpeLoopOverN(spark, docs,
      TextOps.BpeMergeIters)
    base.unpersist(false)
    release()
    require(batched == seq0,
      s"strict-batched merge table must equal sequential:\n$batched\nvs\n$seq0")
    println(s"[bpestrict] equality ok; strict rounds = $rounds for " +
      s"${TextOps.BpeMergeIters} merges")
    val reps = 7
    val (ta, tb) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    (0 until reps).foreach { i =>
      var t0 = System.nanoTime()
      val (_, _, b) = TextOps.bpeLoopOverN(spark, docs, TextOps.BpeMergeIters)
      b.unpersist(false)
      ta(i) = (System.nanoTime() - t0) / 1e9
      release()
      t0 = System.nanoTime()
      TextOps.bpeLoopBatchedOver(docs, TextOps.BpeMergeIters,
        TextOps.BpeBatchCap, strict = true)
      tb(i) = (System.nanoTime() - t0) / 1e9
      release()
    }
    def stats(ts: Array[Double]): String =
      f"min ${ts.min}%.3f med ${ts.sorted.apply(reps / 2)}%.3f max ${ts.max}%.3f"
    println(s"[bpestrict] A(sequential 8-job loop): ${stats(ta)}")
    println(s"[bpestrict] B(strict-batched loop):   ${stats(tb)}")
    spark.stop()
  }
}
