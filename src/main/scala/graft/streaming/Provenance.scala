package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Provenance tasks — reference E3
  * (`create_task_save_DBB_stagein_to_DBB.py:35-39`, SURVEY.md §3.E3):
  * a lineage root is created once per deployment; every ingested row and
  * every dead-letter row is stamped with its `task_id` (save:280, 345).
  *
  * Spark shape: a small `tasks` parquet registry; `createTask` appends a
  * row and returns the id; the ingest pipeline carries the id as a
  * literal column (lineage column), so per-row provenance is a free
  * equi-join against `tasks` at query time.
  */
object Provenance {

  /** Append a new task row (id = max+1) and return its id. Mirrors
    * create_task + FILE_REGISTRATION insert; the "registration" here is
    * the task row itself plus the prov message.
    *
    * NOT concurrency-safe: max+1 is computed on the driver with no lock,
    * matching the reference's single-operator cadence (tasks are created
    * by hand, once per campaign). Concurrent task creation would need a
    * transactional table (Delta/Iceberg) or an external sequence. */
  def createTask(spark: SparkSession, tasksDir: String, name: String,
      provMsg: String): Long = {
    val existing = loadTasks(spark, tasksDir)
    val nextId = existing.agg(coalesce(max(col("task_id")), lit(0L)))
      .head().getLong(0) + 1
    import spark.implicits._
    Seq((nextId, name, provMsg))
      .toDF("task_id", "name", "prov_msg")
      .withColumn("created_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(tasksDir)
    nextId
  }

  def loadTasks(spark: SparkSession, tasksDir: String): DataFrame = {
    // Gate on actual parquet data, not bare dir existence: a createTask
    // killed mid-append leaves only `_temporary/` (or _SUCCESS), and
    // spark.read.parquet on that dir throws — which would permanently
    // brick task creation. Shared rule with every other append-target
    // table (ScaleUtils.hasParquetData); Hadoop FS probe, so the tasks
    // table may live on HDFS/S3 (java.nio only sees local paths).
    if (graft.functions.ScaleUtils.hasParquetData(spark, tasksDir))
      spark.read.parquet(tasksDir)
    else {
      import spark.implicits._
      Seq.empty[(Long, String, String)].toDF("task_id", "name", "prov_msg")
        .withColumn("created_at", current_timestamp())
    }
  }

  /** Lineage join: attach task metadata to any stamped table. */
  def withTaskInfo(stamped: DataFrame, tasks: DataFrame): DataFrame =
    stamped.join(broadcast(tasks.select(col("task_id"), col("name").as("task_name"),
      col("prov_msg"))), Seq("task_id"), "left_outer")
}
