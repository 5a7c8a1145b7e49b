package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing names: verify only that subset (iteration aid;
    // the driver passes exactly two args and gets the full suite)
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — a typo here " +
        "would otherwise verify nothing and exit green")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries that persist()/localCheckpoint() must not leak across
      // the suite — checkpoint blocks live OUTSIDE the catalog cache
      // (the Bench release discipline, r17)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // Subset runs write a DISTINCTLY-NAMED manifest and remove the full
    // one (and vice versa): overwriting oracle_sql.json with a subset
    // while a prior full run's parquet outputs sit in the same outDir
    // would let a later check pass gate only the subset yet read as a
    // full green run (ADVICE r5).
    val (manifest, stale) =
      if (only.isEmpty) ("oracle_sql.json", "oracle_sql_subset.json")
      else ("oracle_sql_subset.json", "oracle_sql.json")
    Files.deleteIfExists(Paths.get(s"$outDir/$stale"))
    Files.writeString(Paths.get(s"$outDir/$manifest"), json)
    if (only.nonEmpty)
      System.err.println(s"[verify] SUBSET run (${only.size} queries) — " +
        s"manifest written to $manifest, not oracle_sql.json")
    spark.stop()
  }
}
