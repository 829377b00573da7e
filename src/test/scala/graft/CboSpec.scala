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

  /** The r12 gap: the spec above proves the reorder over parquet
    * ANALYZE stats, but catalog graftsink tables reported only
    * rows/bytes — a recurring 100 TB workload joined through the
    * catalog lost the reorder. The manifest's per-file NDV sketches
    * close it: the scan reports merged column statistics (distinct
    * count + null count) with NO ANALYZE and NO scan, and CBO moves
    * the selective dim join first.
    */
  private def leafOrderSink(plan: LogicalPlan): Seq[String] =
    plan.collect { case l: LeafNode => l.toString }
      .map { s =>
        Seq("fact", "big", "small").find(n => s.contains(s"cbo.$n"))
          .getOrElse("?")
      }

  private def bottomJoinSink(plan: LogicalPlan): Set[String] = {
    val joins = plan.collect { case j: Join => j }
    val bottom = joins.filter(j =>
      j.children.forall(c => c.collect { case jj: Join => jj }.isEmpty))
    bottom.flatMap(j => leafOrderSink(j)).toSet
  }

  test("graftsink manifest NDV sketches feed CBO: the selective dim " +
      "join reorders first through the CATALOG, no ANALYZE, no scan") {
    val confs = Seq("spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled")
    val prev = confs.map(k => k -> spark.conf.get(k))
    val r = tmpDir("graft_cbo_sink")
    spark.conf.set("spark.sql.catalog.gcbo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcbo.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcbo.cbo")
    try {
      (1 to 100000).map(i => (i.toLong % 20000, i.toLong % 200, i.toLong))
        .toDF("bk", "sk", "payload").coalesce(4)
        .write.format("graftsink").mode("overwrite").save(s"$r/cbo/fact")
      (1 to 20000).map(i => (i.toLong, s"big$i"))
        .toDF("bk", "bname").coalesce(4)
        .write.format("graftsink").mode("overwrite").save(s"$r/cbo/big")
      (1 to 200).map(i =>
        (i.toLong, s"small$i", if (i == 7) "rare" else "common"))
        .toDF("sk", "sname", "attr").coalesce(2)
        .write.format("graftsink").mode("overwrite").save(s"$r/cbo/small")
      def sql = spark.sql(
        """SELECT f.payload, b.bname, s.sname
          |FROM gcbo.cbo.fact f
          |JOIN gcbo.cbo.big b ON f.bk = b.bk
          |JOIN gcbo.cbo.small s ON f.sk = s.sk
          |WHERE s.attr = 'rare'""".stripMargin)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val without = bottomJoinSink(sql.queryExecution.optimizedPlan)
      assert(without == Set("fact", "big"),
        s"text order expected without CBO, got $without; leaves=" +
          sql.queryExecution.optimizedPlan.collect {
            case l: LeafNode => l.toString.take(120) }.mkString(" | "))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val withCbo = bottomJoinSink(sql.queryExecution.optimizedPlan)
      assert(withCbo == Set("fact", "small"),
        s"manifest NDV stats must move the filtered small dim " +
          s"first, got $withCbo")
      assert(sql.count() == 500L)
      // the stats the planner consumed are VISIBLE: `.stats` serves
      // the merged NDV / null counts as a metadata table, and the
      // low-cardinality column merged sparse-EXACT
      val st = spark.sql("SELECT column, ndv, ndv_exact, null_count " +
        "FROM gcbo.cbo.small.stats ORDER BY column").collect()
        .map(row => row.getString(0) ->
          ((row.getLong(1), row.getBoolean(2), row.getLong(3)))).toMap
      assert(st("attr") == ((2L, true, 0L)), s"$st")
      assert(st("sk") == ((200L, false, 0L)) ||
        (st("sk")._1 > 120L && st("sk")._1 < 280L), // HLL band
        s"sk ndv must be a sane estimate: $st")
      // RANGE selectivity: the reported min/max (interval union of
      // the per-file bounds) let FilterEstimation price `payload <=
      // 10000` at ~10% of the 100k uniform rows — without them the
      // estimate cannot leave the default band
      val est = spark.sql(
        "SELECT * FROM gcbo.cbo.fact WHERE payload <= 10000")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(r => r > BigInt(2000) && r < BigInt(30000)),
        s"range estimate must track the manifest bounds, got $est")
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.conf.unset("spark.sql.catalog.gcbo")
    }
  }

  test("pruned-scan stats fold is BUDGETED: past " +
      "spark.graft.stats.prunedFoldMax a pruned scan serves the " +
      "table-level memo (over-approximate, CBO-sound) instead of an " +
      "O(files)-per-plan subset re-fold") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val dir = tmpDir("graft_cbo_prunefold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // three one-file appends with disjoint k bands: per-file NDV 10
      // (sparse-exact), table NDV 30
      Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { band =>
        band.map(k => (k, k * 2)).toDF("k", "v").coalesce(1)
          .write.format("graftsink").mode("append").save(dir)
      }
      def ndvOfPrunedScan: Option[BigInt] = {
        val plan = spark.read.format("graftsink").load(dir)
          .filter(col("k") <= 10L).queryExecution.optimizedPlan
        val rel = plan.collectFirst {
          case r: DataSourceV2ScanRelation => r }.get
        rel.stats.attributeStats
          .find(_._1.name == "k").flatMap(_._2.distinctCount)
      }
      // within budget: the 1 surviving file folds exactly
      assert(ndvOfPrunedScan.contains(BigInt(10)),
        s"selective prune keeps the exact subset fold")
      // budget 0: every pruned scan serves the per-version table memo
      spark.conf.set("spark.graft.stats.prunedFoldMax", "0")
      assert(ndvOfPrunedScan.contains(BigInt(30)),
        s"past the budget the TABLE-level memo answers — " +
          "over-approximate, never O(files) per plan")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.unset("spark.graft.stats.prunedFoldMax")
    }
  }
}
