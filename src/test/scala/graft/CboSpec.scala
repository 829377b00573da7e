package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LeafNode, LogicalPlan}

/** Cost-based optimization under catalog statistics — the 100 TB
  * behavior where ANALYZE TABLE changes the plan: with row/column stats
  * available, Catalyst's cost-based join reorder moves the selective
  * dimension join ahead of the big one regardless of how the SQL was
  * written. Without stats (or with CBO off) the join tree follows text
  * order; a recurring warehouse workload relies on this exact flip, so
  * it's gated here against the optimized logical plan.
  */
class CboSpec extends SparkSpec {
  import spark.implicits._

  /** Depth-first leaf-relation names of the join tree. */
  private def leafOrder(plan: LogicalPlan): Seq[String] =
    plan.collect { case l: LeafNode => l.toString }
      .map { s =>
        Seq("graft_cbo_fact", "graft_cbo_big", "graft_cbo_small")
          .find(s.contains).getOrElse("?")
      }

  private def bottomJoinTables(plan: LogicalPlan): Set[String] = {
    val joins = plan.collect { case j: Join => j }
    val bottom = joins.filter(j =>
      j.children.forall(c => c.collect { case jj: Join => jj }.isEmpty))
    bottom.flatMap(j => leafOrder(j)).toSet
  }

  test("ANALYZE statistics let CBO reorder the selective join first") {
    val confs = Seq("spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled")
    val prev = confs.map(k => k -> spark.conf.get(k))
    def sql = spark.sql(
      """SELECT f.payload, b.bname, s.sname
        |FROM graft_cbo_fact f
        |JOIN graft_cbo_big b ON f.bk = b.bk
        |JOIN graft_cbo_small s ON f.sk = s.sk
        |WHERE s.attr = 'rare'""".stripMargin)
    try {
      Seq("graft_cbo_fact", "graft_cbo_big", "graft_cbo_small")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      (1 to 100000).map(i => (i.toLong % 20000, i.toLong % 200, i.toLong))
        .toDF("bk", "sk", "payload")
        .write.mode("overwrite").saveAsTable("graft_cbo_fact")
      (1 to 20000).map(i => (i.toLong, s"big$i"))
        .toDF("bk", "bname")
        .write.mode("overwrite").saveAsTable("graft_cbo_big")
      (1 to 200).map(i =>
        (i.toLong, s"small$i", if (i == 7) "rare" else "common"))
        .toDF("sk", "sname", "attr")
        .write.mode("overwrite").saveAsTable("graft_cbo_small")
      Seq("graft_cbo_fact", "graft_cbo_big", "graft_cbo_small").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))

      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val without = bottomJoinTables(sql.queryExecution.optimizedPlan)
      assert(without == Set("graft_cbo_fact", "graft_cbo_big"),
        s"text order expected without CBO, got $without")

      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val withCbo = bottomJoinTables(sql.queryExecution.optimizedPlan)
      assert(withCbo == Set("graft_cbo_fact", "graft_cbo_small"),
        s"CBO must join the filtered small dim first, got $withCbo")

      // same answer either way
      assert(sql.count() == 500L)
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
      Seq("graft_cbo_fact", "graft_cbo_big", "graft_cbo_small")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
