package graft.meta

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.EtlJob
import graft.operators.ParquetIO

/** Metadata-driven job control over a tiny Parquet-backed table —
  * the rebuild of the reference's `etl.etl_job` Postgres table
  * (reference: `etl_system/etl_job.csv:1`,
  * `data_integration/pull_raw/utils.py:18-143`).
  *
  * The table is ≤ tens of rows; reading it to the driver
  * (`activeJobs.collect()`) is the one sanctioned driver-side collect in
  * the engine (SURVEY §7 100 TB design rules). Point updates rewrite the
  * whole tiny file — the Parquet analogue of the reference's single-row
  * `UPDATE ... WHERE job_name = %s` (`pull_raw/utils.py:80-85`).
  */
class JobStateStore(spark: SparkSession, path: String) {
  import spark.implicits._

  def seed(jobs: Seq[EtlJob]): Unit =
    ParquetIO.overwriteSafe(jobs.toDS.toDF, path)

  /** Seed from a CSV shaped like `etl_system/etl_job.csv` — header
    * columns are normalized to lowercase
    * (reference `load_metadata.ipynb:66-84`).
    */
  def seedFromCsv(csvPath: String): Unit = {
    val raw = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(csvPath)
    val lowered = graft.operators.Ops.normalizeNames(raw)
    val stamped = lowered
      .withColumn("last_updated_ts", current_timestamp())
      .select(
        $"job_name".cast("string"), $"query_id".cast("long"),
        $"target_table".cast("string"), $"p_key".cast("string"),
        $"status".cast("int"), $"active".cast("int"),
        $"start_ts".cast("timestamp"), $"end_ts".cast("timestamp"),
        $"error_message".cast("string"), $"last_updated_ts")
    ParquetIO.overwriteSafe(stamped, path)
  }

  def all: DataFrame = spark.read.parquet(path)

  /** S3+P5 — metadata scan: active jobs only
    * (reference `pull_raw/utils.py:34-38`: `WHERE active = 1`).
    */
  def activeJobs: Dataset[EtlJob] =
    all.filter($"active" === 1).as[EtlJob]

  private def update(jobName: String, set: DataFrame => DataFrame): Unit = {
    val current = all
    val touched = set(current.filter($"job_name" === jobName))
    val untouched = current.filter($"job_name" =!= jobName ||
      $"job_name".isNull)
    ParquetIO.overwriteSafe(untouched.unionByName(touched), path)
  }

  /** S10 — mark running: `SET start_ts=NOW(), status=-1`
    * (reference `pull_raw/utils.py:80-85`).
    */
  def startJob(jobName: String): Unit = update(jobName, _
    .withColumn("status", lit(EtlJob.Running))
    .withColumn("start_ts", current_timestamp())
    .withColumn("error_message", lit(null).cast("string"))
    .withColumn("last_updated_ts", current_timestamp()))

  /** S10 — mark done: `SET end_ts=NOW(), status=1`
    * (reference `pull_raw/utils.py:120-125`).
    */
  def endJob(jobName: String): Unit = update(jobName, _
    .withColumn("status", lit(EtlJob.Done))
    .withColumn("end_ts", current_timestamp())
    .withColumn("last_updated_ts", current_timestamp()))

  /** Failure record — the reference stores `error_message`
    * (`etl_job.csv:1` column) but never writes a terminal status; the
    * rebuild uses status=2 (documented in model.EtlJob).
    */
  def failJob(jobName: String, error: String): Unit = update(jobName, _
    .withColumn("status", lit(EtlJob.Failed))
    .withColumn("end_ts", current_timestamp())
    .withColumn("error_message", lit(error.take(2000)))
    .withColumn("last_updated_ts", current_timestamp()))
}
