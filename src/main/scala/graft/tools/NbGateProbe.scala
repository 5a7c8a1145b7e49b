package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.StreamingAnalytics

/** Learned-gate throughput probe — measures
  * [[StreamingAnalytics.nbGate]]'s marginal per-batch cost against a
  * STORED model (trained once, persisted — the production shape a
  * curation run materializes): train on the replica corpus, then score
  * it in micro-batches and report docs/s per batch. Run against the
  * 8× replica from the README scale-notes recipe:
  *
  *   sbt "runMain graft.tools.NbGateProbe /tmp/replica8 4"
  */
object NbGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/replica8")
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val (w, p) = TextOps.nbTrain(docs)
    val wMat = w.persist(); val pMat = p.persist()
    val vocab = wMat.count(); pMat.count()
    val trainS = (System.nanoTime() - t0) / 1e9
    println(f"[probe] trained once: $vocab%d-token vocabulary in $trainS%.2f s")
    var totalDocs = 0L
    var totalS = 0.0
    for (b <- 0 until batches) {
      val batch = docs.where(pmod(col("doc_id"), lit(batches)) === b)
        .select(col("doc_id"), col("text")).persist()
      val n = batch.count() // materialized before the timed gate pass
      val g0 = System.nanoTime()
      val flagged = StreamingAnalytics.nbGate(batch, wMat, pMat).count()
      val dt = (System.nanoTime() - g0) / 1e9
      totalDocs += n; totalS += dt
      println(f"[probe] batch $b: $n%6d docs gated in $dt%5.2f s " +
        f"(${n / dt}%8.0f docs/s) flagged=$flagged%d")
      batch.unpersist()
    }
    println(f"[probe] GATE TOTAL: $totalDocs docs in $totalS%.1f s = " +
      f"${totalDocs / totalS}%.0f docs/s (stored-model scoring only)")
    spark.stop()
  }
}
