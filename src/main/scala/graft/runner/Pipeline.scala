package graft.runner

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

import graft.meta.JobStateStore
import graft.model.{FullRefresh, Incremental, TableSpec}
import graft.operators.Ops
import graft.sources.Source

/** One job's outcome — per-job error isolation is a semantic requirement
  * (the reference continues the loop on failure,
  * `pull_raw/__main__.py:173-177`).
  */
case class JobResult(jobName: String, rows: Long, fullRefresh: Boolean,
    error: Option[String])

/** The E2 pipeline loop (reference `pull_raw/__main__.py:132-184`),
  * Spark-native:
  *
  *  - metadata scan → active specs (S3/P5)
  *  - per job: start → fetch (watermark pushed to the source, P7) →
  *    rename/project (P1/P2) → derived transforms (F1) → audit stamp
  *    (P3) → load (S6 full refresh | S7 merge-upsert) → end
  *  - incremental decision tree: missing target or no watermark value ⇒
  *    full refresh (reference `__main__.py:102-115`)
  *  - any failure: record and continue with the next job.
  *
  * LEGACY FALLBACK — prefer [[AtomicPipeline]]. This runner writes the
  * target table and the `etl_job` status row as TWO separate writes
  * (plain Parquet then JobStateStore overwrite), so a crash between
  * them leaves the reference's torn window: data landed, state says
  * running. That is acceptable only for single-writer smoke runs where
  * nothing reads the control table concurrently (and is why this class
  * survives: it needs no transaction root, just a directory).
  * [[AtomicPipeline]] runs the SAME plans and commits (data +
  * job-state) in one manifest rename — use it for anything an operator
  * or a second reader will ever look at.
  */
class Pipeline(spark: SparkSession, source: Source, meta: JobStateStore,
    warehouseDir: String) {

  def targetPath(spec: TableSpec): String =
    s"$warehouseDir/${spec.targetTable.replace('.', '/')}"

  def runJob(spec: TableSpec): JobResult = runJob(spec, RunOptions())

  /** One job under per-invocation options: `--full-refresh` skips the
    * watermark probe entirely and reloads; `--incremental-value`
    * substitutes the given value for the target's MAX (the reference's
    * developer override, `arguments.py:18-24`) — both leave the spec's
    * own strategy untouched for the next unadorned run.
    */
  def runJob(spec: TableSpec, opts: RunOptions): JobResult = {
    meta.startJob(spec.jobName)
    val attempt = Try {
      val path = targetPath(spec)
      val watermark = (spec.strategy, spec.watermarkCol) match {
        case _ if opts.fullRefresh => None
        case (Incremental, Some(c)) =>
          opts.incrementalValue.orElse {
            // partitionCol (derived from the watermark, hence monotone
            // with it) prunes the MAX probe to one partition directory
            Ops.maxWatermark(spark, path, c, spec.partitionCol)
          }
        case _ => None
      }
      val doFull = opts.fullRefresh ||
        spec.strategy == FullRefresh || watermark.isEmpty
      val fetched = source.fetch(spark, spec, watermark)
      val shaped = Ops.auditStamp(
        Ops.applyDerived(
          Ops.renameProject(fetched, spec.renames), spec.derived))
      (doFull, spec.partitionCol) match {
        case (true, pc) => Ops.fullRefresh(shaped, path, pc.toSeq)
        case (false, Some(pc)) =>
          Ops.mergeUpsertPartitioned(spark, path, shaped, spec.pKeys, pc)
        case (false, None) =>
          Ops.mergeUpsert(spark, path, shaped, spec.pKeys)
      }
      JobResult(spec.jobName, Ops.recordCount(spark, path), doFull, None)
    }
    attempt match {
      case Success(r) => meta.endJob(spec.jobName); r
      case Failure(e) =>
        meta.failJob(spec.jobName, e.toString)
        JobResult(spec.jobName, 0L, fullRefresh = false,
          Some(e.toString))
    }
  }

  /** Run every spec whose job is active in the control table, in order,
    * isolating failures per job.
    */
  def run(specs: Seq[TableSpec]): Seq[JobResult] = run(specs, RunOptions())

  /** The metadata-driven loop under CLI options: `--select` narrows to
    * the named jobs but never overrides the control table's active
    * flag (an operator can point a run at one table; they cannot
    * resurrect a disabled job from the command line — the active flag
    * stays the system of record; reference CLI surface
    * `arguments.py:26-33`).
    */
  def run(specs: Seq[TableSpec], opts: RunOptions): Seq[JobResult] = {
    val active = meta.activeJobs.collect().map(_.job_name).toSet
    specs.filter(s => active(s.jobName))
      .filter(s => opts.select.forall(_.contains(s.jobName)))
      .map(runJob(_, opts))
  }
}
