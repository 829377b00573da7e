package graft.runner

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EtlJob, FullRefresh, Incremental, TableSpec}
import graft.operators.{Ops, Transaction}
import graft.sources.Source

/** The E2 pipeline loop with an ATOMIC (data + job-state) commit —
  * closing the torn window [[Pipeline]] inherits from the reference:
  * there the target table lands and the `etl_job` status update is a
  * SECOND write (reference `pull_raw/utils.py:120-125` runs after the
  * loader returns; our `JobStateStore` overwrite is the same shape), so
  * a crash between the two leaves status=-1 with data already landed —
  * an operator reading the control table cannot tell a dead run from a
  * live one, and cannot tell whether the data is old or new.
  *
  * Here both tables live under ONE [[Transaction]] root and each job's
  * completion is ONE cross-table publish:
  *
  * {{{
  * Transaction.publish(root, Map(
  *   "bitcoin.price_usd" -> mergedRelation,
  *   "etl_job"           -> stateWithJobDone))
  * }}}
  *
  * The manifest rename is the only commit point, so every observable
  * state is consistent BY CONSTRUCTION:
  *  - before the publish: old data + old state (running/-1 at most —
  *    a legal "in flight" pair);
  *  - crash INSIDE the publish (data staged, manifest absent): readers
  *    resolve the previous manifest — still old data + old state; the
  *    next run at the same txId deletes the orphan staging;
  *  - after the publish: new data + status=1, together.
  * The status=-1 "running" marker and the status=2 failure record are
  * deliberately their OWN transactions: (running, old data) and
  * (failed, old data) are true statements, and the reference's error
  * isolation (failed job recorded, loop continues) needs the failure
  * to commit even though the data never did.
  *
  * Scale: identical plans to [[Pipeline]] (the merge relation is
  * [[Ops.mergeUpsertDf]], the same anti-join+union); the transaction
  * adds one manifest rename per job and carries unchanged tables
  * forward by reference, so a 100-table warehouse pays O(1) metadata
  * per job commit.
  */
class AtomicPipeline(spark: SparkSession, source: Source, root: String) {
  import spark.implicits._

  val StateTable = "etl_job"

  def seed(jobs: Seq[EtlJob]): Unit =
    Transaction.publish(spark, root, Map(StateTable -> jobs.toDS.toDF))

  def state: DataFrame = Transaction.read(spark, root, StateTable)

  def activeJobs: Seq[EtlJob] =
    state.filter($"active" === 1).as[EtlJob].collect().toSeq

  /** The state relation with one job's row transformed — the
    * [[graft.meta.JobStateStore]] update shape, minus the write (the
    * caller owns the commit).
    */
  private def stateWith(jobName: String,
      set: DataFrame => DataFrame): DataFrame = {
    val cur = state
    set(cur.filter($"job_name" === jobName))
      .unionByName(cur.filter($"job_name" =!= jobName ||
        $"job_name".isNull))
  }

  private def tableNames: Set[String] =
    Transaction.committedTxs(spark, root).lastOption
      .map(Transaction.manifest(spark, root, _).keySet)
      .getOrElse(Set.empty)

  def targetTable(spec: TableSpec): String = spec.targetTable

  def runJob(spec: TableSpec): JobResult = runJob(spec, RunOptions())

  def runJob(spec: TableSpec, opts: RunOptions): JobResult = {
    // running marker: its own commit — "started, not finished" must be
    // visible before the work, and is a consistent pair with old data
    Transaction.publish(spark, root, Map(StateTable ->
      stateWith(spec.jobName, _
        .withColumn("status", lit(EtlJob.Running))
        .withColumn("start_ts", current_timestamp())
        .withColumn("error_message", lit(null).cast("string"))
        .withColumn("last_updated_ts", current_timestamp()))))
    val attempt = Try {
      val table = targetTable(spec)
      val existing =
        if (tableNames.contains(table))
          Some(Transaction.read(spark, root, table))
        else None
      val watermark = (spec.strategy, spec.watermarkCol) match {
        case _ if opts.fullRefresh => None
        case (Incremental, Some(c)) => opts.incrementalValue.orElse(
          existing.flatMap(t =>
            if (t.isEmpty) None else Option(t.agg(max(col(c))).head.get(0))))
        case _ => None
      }
      val doFull = opts.fullRefresh ||
        spec.strategy == FullRefresh || watermark.isEmpty
      val fetched = source.fetch(spark, spec, watermark)
      val shaped = Ops.auditStamp(
        Ops.applyDerived(
          Ops.renameProject(fetched, spec.renames), spec.derived))
      val merged =
        if (doFull) shaped
        else Ops.mergeUpsertDf(existing, shaped, spec.pKeys)
      val done = stateWith(spec.jobName, _
        .withColumn("status", lit(EtlJob.Done))
        .withColumn("end_ts", current_timestamp())
        .withColumn("last_updated_ts", current_timestamp()))
      // THE commit: data and job state flip in one manifest rename
      Transaction.publish(spark, root, Map(table -> merged,
        StateTable -> done))
      (table, doFull)
    }
    attempt match {
      case Success((table, doFull)) =>
        // the verification count runs AFTER the commit point, outside
        // the failure branch: a post-commit read error must surface to
        // the caller, never publish status=Failed over data that DID
        // land (the (failed, new-data) pair this class exists to
        // make impossible)
        JobResult(spec.jobName,
          Transaction.read(spark, root, table).count(), doFull, None)
      case Failure(e) =>
        // error isolation: the failure record commits alone — the data
        // never did, so (failed, old data) is the truthful pair
        Transaction.publish(spark, root, Map(StateTable ->
          stateWith(spec.jobName, _
            .withColumn("status", lit(EtlJob.Failed))
            .withColumn("end_ts", current_timestamp())
            .withColumn("error_message", lit(e.toString.take(2000)))
            .withColumn("last_updated_ts", current_timestamp()))))
        JobResult(spec.jobName, 0L, fullRefresh = false,
          Some(e.toString))
    }
  }

  /** The metadata-driven loop, same semantics as [[Pipeline.run]]. */
  def run(specs: Seq[TableSpec],
      opts: RunOptions = RunOptions()): Seq[JobResult] = {
    val active = activeJobs.map(_.job_name).toSet
    specs.filter(s => active(s.jobName))
      .filter(s => opts.select.forall(_.contains(s.jobName)))
      .map(runJob(_, opts))
  }
}
