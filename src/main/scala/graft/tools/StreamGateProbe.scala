package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingAnalytics

/** 64× streaming-gate throughput probe (VERDICT r10 item 8) — drives
  * [[StreamingAnalytics.runCuratedIngest]] over a 64× replica of
  * sf0.1's documents delivered as parquet micro-batches, and reports
  * docs/s per batch, verdict mix, and the compaction cadence cost.
  * The replica files (every-10th-token rewrite per replica; bounded
  * row groups so scans split) are written by the driver-side recipe in
  * README §scale notes.
  *
  *   sbt "runMain graft.tools.StreamGateProbe /tmp/sf01x64stream"
  */
object StreamGateProbe {
  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/tmp/sf01x64stream")
    val compactEvery = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idxDir = java.nio.file.Files.createTempDirectory("gateprobe_idx")
      .toString + "/idx"
    val ckpt = java.nio.file.Files.createTempDirectory("gateprobe_ck").toString
    val batchTimes = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long, Long)]
    var last = System.nanoTime()
    val t0 = last
    val q = StreamingAnalytics.runCuratedIngest(
      spark.readStream
        .schema(spark.read.parquet(inDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir),
      idxDir, ckpt, compactEveryBatches = compactEvery) { (verdicts, id) =>
      val mix = verdicts.groupBy(col("verdict")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = mix.values.sum
      val now = System.nanoTime()
      val dt = (now - last) / 1e9
      last = now
      val isCompact = compactEvery > 0 && (id + 1) % compactEvery == 0
      batchTimes += ((id, dt, n, mix.getOrElse("dup", 0L)))
      println(f"[probe] batch $id%2d: $n%6d docs in $dt%6.2f s " +
        f"(${n / dt}%8.0f docs/s) dup=${mix.getOrElse("dup", 0L)}%5d " +
        f"admit=${mix.getOrElse("admit", 0L)}%6d" +
        (if (isCompact) "  [compaction batch]" else ""))
    }
    q.awaitTermination()
    val total = (System.nanoTime() - t0) / 1e9
    val docs = batchTimes.map(_._3).sum
    val compactIds = batchTimes.filter(b =>
      compactEvery > 0 && (b._1 + 1) % compactEvery == 0)
    val plainIds = batchTimes.filter(b =>
      !(compactEvery > 0 && (b._1 + 1) % compactEvery == 0))
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.size / 2) }
    println(f"[probe] TOTAL: $docs docs in $total%.1f s = " +
      f"${docs / total}%.0f docs/s over ${batchTimes.size} batches " +
      f"(median plain batch ${med(plainIds.map(_._2).toSeq)}%.2f s, " +
      f"median compaction batch ${
        if (compactIds.nonEmpty) med(compactIds.map(_._2).toSeq) else 0.0}%.2f s, " +
      f"dups flagged ${batchTimes.map(_._4).sum})")
    spark.stop()
  }
}
