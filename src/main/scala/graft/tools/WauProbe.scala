package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamingAnalytics

/** Serving-flatness probe for the daily-sketch WAU family — the
  * streaming-gate probe's question asked of the dashboard path: as the
  * event history grows 1× → 64×, the BUILD (one event scan into
  * per-day sketches) may grow linearly, but SERVING the trailing-WAU
  * estimates off the stored table must stay flat (the table is |days|
  * rows regardless of event count — the "costs the same tonight as
  * after a year of stream" claim, measured).
  *
  *   sbt "runMain graft.tools.WauProbe <sfDir> [reps]"
  */
object WauProbe {
  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tbl = java.nio.file.Files.createTempDirectory("wauprobe").toString
    val nEvents = spark.read.parquet(s"$inDir/events.parquet").count()

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // BUILD: one pass of the whole history into the maintained table
    val build = time {
      StreamingAnalytics.updateDaySketches(
        spark.read.parquet(s"$inDir/events.parquet"), tbl, batchId = 0L)
    }
    val nDays = StreamingAnalytics.loadDaySketches(spark, tbl).count()
    // SERVE: repeated dashboard reads off the stored table
    val serves = (1 to reps).map(_ => time {
      StreamingAnalytics.wauFromDaySketches(spark, tbl).collect()
    })
    println(f"[wauprobe] dir=$inDir events=$nEvents days=$nDays " +
      f"build=$build%.2fs serve_min=${serves.min}%.2fs " +
      f"serves=${serves.map(s => f"$s%.2f").mkString(",")}")
    spark.stop()
  }
}
