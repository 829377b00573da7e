package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** PLANS.lock — a diff-gated physical-plan fingerprint per declared
  * batch query.
  *
  * PLANS.md regenerates ~85 formatted plans each round for human
  * review, but nothing READ them: a silent plan regression outside the
  * PlanSpec-gated subset (an Exchange appearing in an ungated query, a
  * broadcast flipping to a sort-merge join) would ship unnoticed in
  * 2,400 lines of churn. This tool emits one CANONICAL fingerprint per
  * query — a hash of the operator-shape tree, normalized so it is
  * stable across runs, temp paths, expression IDs, and partition
  * counts — into `PLANS.lock`, which is committed.
  *
  * The gate: `tools/roundcheck.sh` regenerates the lock and FAILS on
  * any fingerprint that differs from the committed file (also on
  * added/removed queries that the commit didn't carry). An INTENTIONAL
  * plan change therefore must land with the regenerated PLANS.lock in
  * the same commit — the lock diff names exactly which queries' plans
  * moved, turning "plan drift" into a reviewable one-line-per-query
  * diff instead of silence. Walkthrough for an intentional change:
  *   1. change the operator;
  *   2. `sbt "runMain graft.tools.PlanLock"` (rewrites PLANS.lock);
  *   3. commit code + lock together — the commit diff shows
  *      `q_foo <old> -> <new>`, the reviewer sees which plans moved;
  *   4. roundcheck regenerates and matches -> gate green.
  *
  * What the fingerprint covers (and deliberately not): the PRE-AQE
  * physical operator tree — node class names, join types/strategies,
  * exchange partitioning class, scan output arity and pushed-filter
  * count — each node with its children, plus subquery plans. It
  * excludes expression IDs, file paths, statistics, and partition
  * counts (session-dependent), so two identical builds on different
  * machines produce byte-identical locks. Streaming (`st_*`) queries
  * are excluded HERE: their builder runs the stream and returns a
  * final read whose plan is just the sink scan — their RUNTIME
  * stateful plans (state-store chains, watermark placement) are
  * locked separately by [[StreamPlanLock]] into `STREAMPLANS.lock`,
  * and their data shape by the batch twins, which ARE locked.
  *
  * Scope note: fingerprints are taken at sf0.001 (the fixture scale),
  * so a SIZE-dependent strategy flip at larger SFs (a broadcast
  * crossing the threshold) is invisible here by design — that class
  * of property belongs to the PlanSpec gates, which assert the
  * intended strategy explicitly for the queries where it matters.
  * The lock's job is catching UNINTENDED shape drift from code or
  * optimizer-rule changes, which manifests at every scale.
  */
object PlanLock {

  /** Canonical operator-shape string: nodeName + stable discriminants
    * per node kind, children in tree order, subqueries appended
    * sorted (their order in the expression tree is not semantic).
    */
  def shape(p: SparkPlan): String = {
    val detail = p match {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        val pushed = s.metadata.getOrElse("PushedFilters", "[]")
        val n = if (pushed == "[]") 0 else pushed.count(_ == ',') + 1
        s"[cols=${s.output.size},pushed=$n]"
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        s"[${e.outputPartitioning.getClass.getSimpleName}]"
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        s"[${j.joinType}]"
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        s"[grp=${a.groupingExpressions.size},agg=${a.aggregateExpressions.size}]"
      // stateful streaming operators (StreamPlanLock's runtime plans;
      // never present in batch plans): the discriminants are exactly
      // the silent-regression surfaces the lock exists to freeze — a
      // lost/retimed watermark, a flipped output mode, a timeout
      // change, a state-join type flip
      case w: org.apache.spark.sql.execution.streaming.operators.stateful
          .EventTimeWatermarkExec =>
        s"[delayMs=${w.delayMs}]"
      case s: org.apache.spark.sql.execution.streaming.operators.stateful
          .StateStoreSaveExec =>
        s"[${s.outputMode.map(_.toString).getOrElse("?")}]"
      case s: org.apache.spark.sql.execution.streaming.operators.stateful
          .SessionWindowStateStoreSaveExec =>
        s"[${s.outputMode.map(_.toString).getOrElse("?")}]"
      case f: org.apache.spark.sql.execution.streaming.operators.stateful
          .flatmapgroupswithstate.FlatMapGroupsWithStateExec =>
        s"[${f.outputMode},${f.timeoutConf}]"
      case j: org.apache.spark.sql.execution.streaming.operators.stateful
          .join.StreamingSymmetricHashJoinExec =>
        s"[${j.joinType}]"
      case _ => ""
    }
    // subquery expressions in the PRE-AQE plan may still hold LOGICAL
    // plans (PlanSubqueries runs at execution preparation) — shape
    // whichever side is present rather than casting
    val subShapes = p.expressions.flatMap(_.collect {
      case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
        pe.plan match {
          case sp: SparkPlan => shape(sp)
          case lp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
            logicalShape(lp)
          case other => other.getClass.getSimpleName
        }
    }).sorted
    val subs =
      if (subShapes.isEmpty) "" else subShapes.mkString("{", ";", "}")
    // BatchScanExec.nodeName embeds the table name — for path tables
    // that is a per-run temp directory; normalize to the scan CLASS
    // (which distinguishes a graftsink data scan from its metadata-
    // aggregate scan) + output arity
    val name = p match {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s"BatchScan[${b.scan.getClass.getSimpleName},cols=${b.output.size}]"
      case _ => p.nodeName
    }
    name + detail + subs +
      p.children.map(shape).mkString("(", ",", ")")
  }

  private def logicalShape(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): String =
    p.nodeName + p.children.map(logicalShape).mkString("(", ",", ")")

  def fingerprint(p: SparkPlan): String =
    java.lang.Long.toHexString(graft.expressions.Kernels.fnv1a64(
      org.apache.spark.unsafe.types.UTF8String.fromString(shape(p))))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PLANS.lock")
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // fixture dir is env-parameterized like roundcheck.sh's scales
    // (ADVICE r9: a hardcoded path makes the committed gate fail as
    // PLANDIFF_RC=2 on any machine without this exact layout). The
    // fingerprints are size-independent (see scaladoc), so any
    // same-schema fixture dir reproduces the committed lock.
    val sf = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_PLANLOCK_SF", "/root/testdata/sf0.001"))
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("st_")) // see scaladoc: batch twins gate
      .map { case (name, fn) =>
        val fp =
          try fingerprint(fn(spark, sf).queryExecution.sparkPlan)
          catch { case e: Throwable =>
            System.err.println(s"[planlock] $name failed: ${e.getMessage}")
            "BUILD_FAILED"
          }
        s"$name\t$fp"
      }
    val header =
      "# PLANS.lock — canonical physical-plan fingerprints " +
        "(graft.tools.PlanLock)\n" +
      "# Regenerate with: sbt \"runMain graft.tools.PlanLock\"\n" +
      "# roundcheck fails on any diff vs this committed file; " +
        "intentional plan\n" +
      "# changes must commit the regenerated lock alongside the code.\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      header + rows.mkString("", "\n", "\n"))
    println(s"wrote $out (${rows.size} fingerprints)")
    spark.stop()
  }
}
