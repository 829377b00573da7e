package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal same-package accessor for the one Spark internal a custom
  * whole-operator needs: turning a [[LogicalPlan]] built by the graft
  * library (e.g. [[graft.plans.AsOfJoin]]) back into a user-facing
  * `DataFrame`. `Dataset.ofRows` is `private[sql]`, so the bridge
  * lives in `org.apache.spark.sql` — the standard pattern every Spark
  * extension library that introduces its own logical operators uses.
  * Nothing else from the internals is re-exported.
  */
object GraftSqlInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
