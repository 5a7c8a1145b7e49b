package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor directory.
  * All scans go through here so that read-side options (and, at cluster
  * scale, partitioned registry layouts — SURVEY.md §4 "partition pruning")
  * are controlled in one place. Column pruning and predicate pushdown are
  * left to Catalyst: callers `.select`/`.where` and the parquet scan only
  * reads what survives.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS). Depending on the Spark
    * build this reads back one of two ways, and we normalize BOTH to a
    * session-zoned microsecond TimestampType column:
    *   - older builds honor `spark.sql.legacy.parquet.nanosAsLong` and
    *     surface a raw nanosecond LongType → truncate to micros with
    *     integral `div` (`/` would go through double and lose precision
    *     above 2^53; ns epoch values are ~1.7e18);
    *   - newer builds read NANOS natively as TIMESTAMP_NTZ (micros,
    *     floor-truncated — same integer division) and ignore the legacy
    *     flag → cast NTZ to TimestampType (wall time interpreted in the
    *     session zone; Verify/Bench pin UTC, matching the oracle's
    *     naive-timestamp formatting).
    * Branching on the READ-BACK type (not the Spark version string)
    * keeps this correct under either reader. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
