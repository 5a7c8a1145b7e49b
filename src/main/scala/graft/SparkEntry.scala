package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module catalogs; every key has a DuckDB
  * oracle in `oracleSql` unless the operator is not SQL-expressible
  * (driver then records a weaker rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ ReconOps.queries ++ TextOps.queries ++
      VectorOps.queries ++ DedupOps.queries ++ IngestOps.queries ++
      MultimodalOps.queries ++ MonitorOps.queries ++ CurationOps.queries ++
      ChatOps.queries ++ LayoutOps.queries ++ JsonOps.queries ++
      FuzzyOps.queries ++ GraphOps.queries ++ UrlOps.queries ++
      DedupOps.prodQueries ++ CurationOps.prodQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ ReconOps.oracles ++ TextOps.oracles ++
      VectorOps.oracles ++ DedupOps.oracles ++ IngestOps.oracles ++
      MultimodalOps.oracles ++ MonitorOps.oracles ++ CurationOps.oracles ++
      ChatOps.oracles ++ LayoutOps.oracles ++ JsonOps.oracles ++
      FuzzyOps.oracles ++ GraphOps.oracles ++ UrlOps.oracles ++
      DedupOps.prodOracles ++ CurationOps.prodOracles
}
