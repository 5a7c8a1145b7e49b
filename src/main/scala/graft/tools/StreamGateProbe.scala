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

  /** Discovery-loop scenario (VERDICT r16 item 5):
    *   sbt "runMain graft.tools.StreamGateProbe --discovery [sfDir]"
    * Drives [[StreamingAnalytics.foldWithDiscovery]] over 4 waves of
    * the documents table in which each wave INTRODUCES new domains
    * (hash-assigned introduction wave per source) alongside docs from
    * already-registered ones — the crawl regime the grow-and-requeue
    * protocol exists for. Per wave: docs, dropped-at-fold, re-queued,
    * registry size, wall. End invariants printed as PASS/FAIL:
    * every doc contributes exactly one edge unit (sum(w) == docs
    * folded — the loop is lossless across growth boundaries), and the
    * authority serve ranks every registered domain. */
  private def discoveryScenario(spark: SparkSession, sfDir: String): Unit = {
    import graft.sources.Tables
    val dir = java.nio.file.Files
      .createTempDirectory("discovery_probe").toString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .withColumn("wave", pmod(xxhash64(col("source")), lit(4)))
      .localCheckpoint(true)
    var folded = 0L
    (0 to 3).foreach { k =>
      val batch = docs.where(col("wave") === k ||
        (col("wave") < k && pmod(col("doc_id"), lit(4)) === k))
        .select(col("doc_id"), col("source"))
      val n = batch.count(); folded += n
      val t0 = System.nanoTime()
      val (dropped, requeued) = StreamingAnalytics
        .foldWithDiscovery(batch, dir, 2L * k, 2L * k + 1)
      val regN = StreamingAnalytics.loadDomainRegistry(spark, dir).count()
      println(f"[probe] wave $k: $n%6d docs, dropped $dropped%5d, " +
        f"requeued $requeued%5d, registry $regN%4d domains, " +
        f"${(System.nanoTime() - t0) / 1e9}%5.2f s")
    }
    val w = StreamingAnalytics.loadLinkGraph(spark, dir)
      .agg(sum(col("w"))).head().getLong(0)
    val reg = StreamingAnalytics.loadDomainRegistry(spark, dir)
      .localCheckpoint(true)
    val ranked = StreamingAnalytics
      .authorityFromLinkGraph(spark, dir, reg).count()
    val ok = w == folded && ranked == reg.count()
    println(s"[probe] lossless: sum(w)=$w vs docs=$folded; " +
      s"authority ranks $ranked/${reg.count()} domains — " +
      (if (ok) "PASS" else "FAIL"))
    if (!ok) sys.exit(1)
  }

  /** Streaming WARC composition scenario (VERDICT r17 item 3):
    *   sbt "runMain graft.tools.StreamGateProbe --warc [sfDir]"
    * Synthesizes real multi-record `.warc.gz` container files from the
    * documents table (~50 response records per container, gzip members
    * per doc — the CommonCrawl shape), then drives
    * [[StreamingAnalytics.runWarcIngest]] over them as a binaryFile
    * stream: split → HTTP unwrap → charset decode → extract → WET
    * materialization per batch → curated admission verdicts. Prints
    * per-batch docs/s + verdict mix; end invariants PASS/FAIL: one WET
    * row and one verdict per planted response record. */
  private def warcScenario(spark: SparkSession, sfDir: String): Unit = {
    val warcDir = java.nio.file.Files
      .createTempDirectory("warcprobe_in")
    val docs = graft.operators.TextOps
      .warcDocs(graft.sources.Tables.documents(spark, sfDir))
      .withColumn("grp", expr("doc_id div 50"))
      .collect()
    var nDocs = 0L
    docs.groupBy(_.getAs[Long]("grp")).foreach { case (grp, rows) =>
      val bos = new java.io.ByteArrayOutputStream()
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(r.getAs[Array[Byte]]("warc")); g.finish(); g.close()
        nDocs += 1
      }
      java.nio.file.Files.write(
        warcDir.resolve(s"crawl-$grp.warc.gz"), bos.toByteArray)
    }
    val idxDir = java.nio.file.Files.createTempDirectory("warcprobe_idx")
      .toString + "/idx"
    val outDir = java.nio.file.Files.createTempDirectory("warcprobe_out")
      .toString
    val binSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    var verdictRows = 0L
    val t0 = System.nanoTime()
    var last = t0
    val q = StreamingAnalytics.runWarcIngest(
      spark.readStream.format("binaryFile").schema(binSchema)
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", "2").load(warcDir.toString),
      idxDir, outDir,
      java.nio.file.Files.createTempDirectory("warcprobe_ck").toString,
      compactEveryBatches = 4) { (verdicts, id) =>
      val mix = verdicts.groupBy(col("verdict")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = mix.values.sum
      verdictRows += n
      val now = System.nanoTime()
      println(f"[probe] warc batch $id%2d: $n%5d docs in " +
        f"${(now - last) / 1e9}%5.2f s " +
        f"admit=${mix.getOrElse("admit", 0L)}%5d " +
        f"dup=${mix.getOrElse("dup", 0L)}%4d " +
        f"low_q=${mix.getOrElse("low_quality", 0L)}%4d " +
        f"rep=${mix.getOrElse("repetitive", 0L)}%4d")
      last = now
    }
    q.awaitTermination()
    val wetRows = spark.read.parquet(s"$outDir/wet").count()
    val total = (System.nanoTime() - t0) / 1e9
    val ok = wetRows == nDocs && verdictRows == nDocs
    println(f"[probe] TOTAL: $nDocs docs in $total%.1f s = " +
      f"${nDocs / total}%.0f docs/s; WET rows $wetRows, " +
      s"verdicts $verdictRows — " + (if (ok) "PASS" else "FAIL"))
    if (!ok) sys.exit(1)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--warc")) {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      warcScenario(spark, args.lift(1).getOrElse("/root/testdata/sf0.01"))
      spark.stop()
      return
    }
    if (args.headOption.contains("--discovery")) {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      discoveryScenario(spark,
        args.lift(1).getOrElse("/root/testdata/sf0.01"))
      spark.stop()
      return
    }
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
