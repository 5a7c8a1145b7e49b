package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/timing probe: runs the named queries twice (cold + warm) and can
  * print the formatted physical plan. Usage:
  *   runMain graft.tools.QueryProbe <sfDir> [--explain] q1 q2 ...
  */
object QueryProbe {
  /** The `_hot` fixture relation (every even user folds onto id 0). */
  private def hotEvents(s: SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.events(s, d)
      .select(expr(graft.operators.ReconOps.HotUidSql).as("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // product entry points that are not declared queries (auto-sized
    // variants etc.) but whose scale behavior the probe must measure
    val extras: Map[String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "x_hubness_auto" -> ((s, d) => graft.operators.VectorOps.hubnessAuto(s, d)),
      "x_semdedup_auto" -> ((s, d) => graft.operators.DedupOps.semDedupAuto(s, d)),
      // plain-vs-salted A/B on the HOT-KEY remap — measures the salted
      // decomposition's payoff in the regime it exists for (the auto
      // queries only ever run ONE branch, so the loser is otherwise
      // never timed on skewed data)
      "x_sessionize_hot_plain" -> ((s, d) =>
        graft.operators.ReconOps.sessionizeOf(hotEvents(s, d))),
      "x_sessionize_hot_salted" -> ((s, d) =>
        graft.operators.ReconOps.sessionizeSaltedOf(hotEvents(s, d),
          graft.operators.ReconOps.AsofSaltBucketUs)))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name, extras(name))
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // same between-rep release discipline as Bench: checkpoint
        // blocks are persisted RDDs outside the catalog cache
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
