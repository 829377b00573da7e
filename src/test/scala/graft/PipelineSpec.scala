package graft

import java.nio.file.{Files, Paths}

import graft.meta.JobStateStore
import graft.model._
import graft.runner.Pipeline
import graft.sources.FixtureSource

/** End-to-end pipeline test over synthesized bitcoin-shaped JSON fixtures
  * (SURVEY §5 test 4): full run, then an incremental run that must apply
  * only the delta past the watermark.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String, queryId: Long, lines: Seq[String]): Unit =
    Files.write(Paths.get(s"$dir/$queryId.json"),
      lines.mkString("\n").getBytes("UTF-8"))

  private def seedJobs(meta: JobStateStore, specs: Seq[TableSpec],
      activeNames: Set[String]): Unit =
    meta.seed(specs.map(s => EtlJob(s.jobName, s.queryId, s.targetTable,
      s.pKeys.mkString(","), None, if (activeNames(s.jobName)) 1 else 0,
      None, None, None, None)))

  test("full + incremental run over prices_usd fixture") {
    val base = tmpDir("pipe")
    val fixtures = s"$base/fixtures"; Files.createDirectories(Paths.get(fixtures))
    val spec = BitcoinWarehouse.pricesUsd
    writeFixture(fixtures, spec.queryId, Seq(
      """{"date": "2025-01-01", "price": 95000.0}""",
      """{"date": "2025-01-02", "price": 96000.0}"""))

    val meta = new JobStateStore(spark, s"$base/etl_job")
    seedJobs(meta, Seq(spec), Set(spec.jobName))
    val pipe = new Pipeline(spark, new FixtureSource(fixtures), meta,
      s"$base/warehouse")

    val r1 = pipe.run(Seq(spec))
    assert(r1.map(r => (r.jobName, r.rows, r.fullRefresh, r.error)) ==
      Seq((spec.jobName, 2L, true, None)))
    val t1 = spark.read.parquet(pipe.targetPath(spec))
    assert(t1.columns.sorted.toSeq ==
      Seq("date", "etl_updated_ts", "price_in_dollar"))

    // job state: done
    val job = meta.all.filter($"job_name" === spec.jobName).head
    assert(job.getAs[Int]("status") == EtlJob.Done)
    assert(job.getAs[java.sql.Timestamp]("end_ts") != null)

    // incremental: one new date + a stale repeat of an old one; only the
    // new row (past the watermark) must land
    writeFixture(fixtures, spec.queryId, Seq(
      """{"date": "2025-01-02", "price": 1.0}""",
      """{"date": "2025-01-03", "price": 97000.0}"""))
    val r2 = pipe.run(Seq(spec))
    assert(r2.head.fullRefresh == false)
    assert(r2.head.rows == 3)
    val prices = spark.read.parquet(pipe.targetPath(spec))
      .select("date", "price_in_dollar").as[(String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(prices == Seq(("2025-01-01", 95000.0), ("2025-01-02", 96000.0),
      ("2025-01-03", 97000.0)))
  }

  test("per-job error isolation: a broken job does not stop the loop") {
    val base = tmpDir("iso")
    val fixtures = s"$base/fixtures"; Files.createDirectories(Paths.get(fixtures))
    val good = BitcoinWarehouse.inputs
    val bad = BitcoinWarehouse.outputs // no fixture written → fetch fails
    writeFixture(fixtures, good.queryId, Seq(
      """{"address": "addr1", "tx_id": "t1", "value": 0.5}"""))

    val meta = new JobStateStore(spark, s"$base/etl_job")
    seedJobs(meta, Seq(bad, good), Set(bad.jobName, good.jobName))
    val pipe = new Pipeline(spark, new FixtureSource(fixtures), meta,
      s"$base/warehouse")

    val results = pipe.run(Seq(bad, good))
    assert(results.find(_.jobName == bad.jobName).get.error.isDefined)
    val goodResult = results.find(_.jobName == good.jobName).get
    assert(goodResult.error.isEmpty && goodResult.rows == 1)

    val statuses = meta.all.select("job_name", "status")
      .as[(String, Option[Int])].collect().toMap
    assert(statuses(bad.jobName).contains(EtlJob.Failed))
    assert(statuses(good.jobName).contains(EtlJob.Done))

    // derived UPPER transform landed
    val row = spark.read.parquet(pipe.targetPath(good)).head
    assert(row.getAs[String]("dimension_attribute_name") == "ADDR1")
  }

  test("partitioned table: full sync lays out hive dirs; delta touches " +
      "only its partition") {
    val base = tmpDir("pipe_part")
    val fixtures = s"$base/fixtures"; Files.createDirectories(Paths.get(fixtures))
    val spec = BitcoinWarehouse.transactions
    writeFixture(fixtures, spec.queryId, Seq(
      """{"block_time":"2025-01-01T00:01:00","fee":0.01,"id":"t1","input_value":0.5,"output_value":0.49}""",
      """{"block_time":"2025-01-02T00:01:00","fee":0.02,"id":"t2","input_value":1.0,"output_value":0.98}"""))
    val meta = new JobStateStore(spark, s"$base/etl_job")
    seedJobs(meta, Seq(spec), Set(spec.jobName))
    val pipe = new Pipeline(spark, new FixtureSource(fixtures), meta,
      s"$base/warehouse")
    assert(pipe.run(Seq(spec)).head.rows == 2L)
    val root = new java.io.File(pipe.targetPath(spec))
    assert(root.listFiles().map(_.getName).toSet
      .contains("block_date=2025-01-01"))
    def day1Files = new java.io.File(root, "block_date=2025-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = day1Files
    Thread.sleep(1100)
    // delta: one new tx on a NEW day; watermark keeps t1/t2 out
    writeFixture(fixtures, spec.queryId, Seq(
      """{"block_time":"2025-01-01T00:01:00","fee":9.9,"id":"t1","input_value":9.9,"output_value":9.9}""",
      """{"block_time":"2025-01-03T00:01:00","fee":0.03,"id":"t3","input_value":2.0,"output_value":1.96}"""))
    val r2 = pipe.run(Seq(spec)).head
    assert(!r2.fullRefresh && r2.rows == 3L)
    assert(day1Files == before,
      "untouched day-1 partition was rewritten by the delta merge")
    val t1fee = spark.read.parquet(pipe.targetPath(spec))
      .filter($"transaction_id" === "t1")
      .select("dimension_attribute_record_id").as[Double].head()
    assert(t1fee == 0.01, "stale pre-watermark repeat must not apply")
  }

  test("CLI options: --select narrows the run, --full-refresh forces a " +
    "reload, --incremental-value overrides the watermark") {
    val base = tmpDir("cli")
    val fixtures = s"$base/fixtures"; Files.createDirectories(Paths.get(fixtures))
    val prices = BitcoinWarehouse.pricesUsd
    val block = BitcoinWarehouse.block
    writeFixture(fixtures, prices.queryId, Seq(
      """{"date": "2025-01-01", "price": 95000.0}""",
      """{"date": "2025-01-02", "price": 96000.0}"""))
    val meta = new JobStateStore(spark, s"$base/etl_job")
    seedJobs(meta, Seq(prices, block), Set(prices.jobName, block.jobName))
    val pipe = new Pipeline(spark, new FixtureSource(fixtures), meta,
      s"$base/warehouse")

    // --select: only prices runs even though block is active (and its
    // missing fixture would otherwise record a failure)
    val opts1 = graft.runner.RunOptions.parse(
      Seq("--select", prices.jobName))
    val r1 = pipe.run(Seq(prices, block), opts1)
    assert(r1.map(_.jobName) == Seq(prices.jobName))
    assert(r1.head.rows == 2L && r1.head.fullRefresh)

    // --incremental-value: explicit watermark replaces the target MAX —
    // '2024-12-31' re-admits BOTH fixture rows (the stored max
    // 2025-01-02 would admit neither), so a changed 01-02 price lands
    writeFixture(fixtures, prices.queryId, Seq(
      """{"date": "2025-01-01", "price": 95000.0}""",
      """{"date": "2025-01-02", "price": 1.0}"""))
    val r2 = pipe.run(Seq(prices), graft.runner.RunOptions.parse(
      Seq("--select", prices.jobName, "--incremental-value", "2024-12-31")))
    assert(!r2.head.fullRefresh && r2.head.rows == 2L)
    val p0102 = spark.read.parquet(pipe.targetPath(prices))
      .filter($"date" === "2025-01-02")
      .select("price_in_dollar").as[Double].head()
    assert(p0102 == 1.0,
      "the overridden watermark must re-admit the changed row")

    // --full-refresh: watermark skipped entirely, target rebuilt from
    // the (now 1-row) fixture
    writeFixture(fixtures, prices.queryId, Seq(
      """{"date": "2025-02-01", "price": 99000.0}"""))
    val r3 = pipe.run(Seq(prices), graft.runner.RunOptions.parse(
      Seq("--full-refresh")))
    assert(r3.head.fullRefresh && r3.head.rows == 1L)
    assert(spark.read.parquet(pipe.targetPath(prices)).count() == 1L)

    // parse errors are loud
    intercept[RuntimeException] {
      graft.runner.RunOptions.parse(Seq("--ful-refresh"))
    }
    intercept[RuntimeException] {
      graft.runner.RunOptions.parse(Seq("--incremental-value"))
    }
    intercept[RuntimeException] {
      graft.runner.RunOptions.parse(Seq("--select", "--full-refresh"))
    }
  }

  test("inactive jobs are skipped (metadata scan WHERE active=1)") {
    val base = tmpDir("inact")
    val fixtures = s"$base/fixtures"; Files.createDirectories(Paths.get(fixtures))
    val spec = BitcoinWarehouse.block
    val meta = new JobStateStore(spark, s"$base/etl_job")
    seedJobs(meta, Seq(spec), Set.empty)
    val pipe = new Pipeline(spark, new FixtureSource(fixtures), meta,
      s"$base/warehouse")
    assert(pipe.run(Seq(spec)).isEmpty)
  }

  test("the FIVE-table warehouse runs atomically end-to-end: every " +
      "job's (data, done-state) pair commits as one transaction, and " +
      "every table of the same tx id reads consistently") {
    import graft.operators.Transaction
    import graft.runner.AtomicPipeline
    val base = tmpDir("atomic5")
    val fixtures = s"$base/fixtures"
    Files.createDirectories(Paths.get(fixtures))
    writeFixture(fixtures, 2177353L, Seq(
      """{"address":"bc1qa", "tx_id":"t1", "value":0.5}"""))
    writeFixture(fixtures, 2177447L, Seq(
      """{"address":"bc1qc", "tx_id":"t1", "value":0.49}"""))
    writeFixture(fixtures, 5816212L, Seq(
      """{"date":"2025-01-01", "price":95000.0}"""))
    writeFixture(fixtures, 2177280L, Seq(
      """{"block_time":"2025-01-01T00:01:00", "fee":0.01, "id":"t1", """ +
        """"input_value":0.5, "output_value":0.49}"""))
    writeFixture(fixtures, 2177266L, Seq(
      """{"coinbase":"cb", "difficulty":1.0, "hash":"h1", "height":1, """ +
        """"mint_reward":3.125, "nonce":42, "previous_block_hash":"h0", """ +
        """"size":100, "total_fees":0.01, "total_reward":3.135, """ +
        """"transaction_count":1, "weight":400}"""))
    val specs = BitcoinWarehouse.all
    val root = s"$base/tx"
    val pipe = new AtomicPipeline(spark, new FixtureSource(fixtures), root)
    pipe.seed(specs.map(s => EtlJob(s.jobName, s.queryId, s.targetTable,
      s.pKeys.mkString(","), None, 1, None, None, None, None)))
    val results = pipe.run(specs)
    assert(results.size === 5)
    assert(results.forall(_.error.isEmpty), results.mkString("; "))
    assert(results.forall(_.rows === 1L))
    // all five jobs read Done in the control table
    val statuses = pipe.state.select("job_name", "status")
      .as[(String, Option[Int])].collect().toMap
    assert(specs.forall(s => statuses(s.jobName).contains(EtlJob.Done)))
    // snapshot consistency: at the LATEST committed tx, every table
    // the manifest lists resolves, and each job's data/state pair
    // belongs to the same tx by construction (one publish each)
    val last = Transaction.committedTxs(spark, root).last
    val m = Transaction.manifest(spark, root, last)
    specs.foreach { s =>
      assert(m.contains(s.targetTable), s"${s.targetTable} not in tx")
      assert(Transaction.read(spark, root, s.targetTable).count() === 1L)
    }
    // the derived UPPER transform still lands through the atomic path
    assert(Transaction.read(spark, root, "bitcoin.input")
      .select("dimension_attribute_name").as[String].head() === "BC1QA")
  }

  test("atomic (data + job-state) publish: a crash at the commit " +
      "point can never leave state and table contents disagreeing") {
    import graft.operators.Transaction
    import graft.runner.AtomicPipeline
    val base = tmpDir("atomic")
    val fixtures = s"$base/fixtures"
    Files.createDirectories(Paths.get(fixtures))
    val spec = BitcoinWarehouse.pricesUsd
    writeFixture(fixtures, spec.queryId, Seq(
      """{"date": "2025-01-01", "price": 95000.0}""",
      """{"date": "2025-01-02", "price": 96000.0}"""))
    val root = s"$base/tx"
    val pipe = new AtomicPipeline(spark, new FixtureSource(fixtures), root)
    pipe.seed(Seq(EtlJob(spec.jobName, spec.queryId, spec.targetTable,
      spec.pKeys.mkString(","), None, 1, None, None, None, None)))

    // baseline: one job = one atomic commit of (table, done-state)
    val r1 = pipe.runJob(spec)
    assert(r1.error.isEmpty && r1.rows === 2L)
    def status(): Int = pipe.state
      .filter($"job_name" === spec.jobName).head.getAs[Int]("status")
    def tableRows(): Seq[(String, Double)] =
      Transaction.read(spark, root, spec.targetTable)
        .select("date", "price_in_dollar").as[(String, Double)]
        .collect().sortBy(_._1).toSeq
    assert(status() === EtlJob.Done)
    val before = tableRows()
    assert(before.map(_._1) === Seq("2025-01-01", "2025-01-02"))

    // incremental delta staged; CRASH injected at the commit point of
    // the (data + state) publish — data dirs staged, manifest absent
    writeFixture(fixtures, spec.queryId, Seq(
      """{"date": "2025-01-02", "price": 1.0}""",
      """{"date": "2025-01-03", "price": 97000.0}"""))
    var calls = 0
    Transaction.commitBarrier = () => {
      calls += 1
      // call 1 = the running marker; call 2 = the atomic data+state
      // commit — the exact window the non-atomic runner tears in
      if (calls == 2) sys.error("injected crash at the commit point")
    }
    val crashed =
      try pipe.runJob(spec)
      finally Transaction.commitBarrier = () => ()
    // runner-level recovery view: the failure record committed ALONE,
    // the data never did — (failed, old contents) is a truthful pair
    assert(crashed.error.exists(_.contains("injected crash")))
    assert(status() === EtlJob.Failed)
    assert(tableRows() === before,
      "a crashed commit must leave the table at its previous contents")

    // raw process-death view (no recovery code runs): the same torn
    // publish, observed directly — BOTH tables still read old
    Transaction.commitBarrier =
      () => sys.error("injected crash at the commit point")
    intercept[RuntimeException] {
      Transaction.publish(spark, root, Map(
        spec.targetTable -> Transaction.read(spark, root, spec.targetTable)
          .limit(1),
        pipe.StateTable -> pipe.state))
    }
    Transaction.commitBarrier = () => ()
    assert(tableRows() === before)
    assert(status() === EtlJob.Failed)

    // recovery: a plain re-run flips data and state TOGETHER; the
    // watermark keeps the stale 01-02 repeat out, like the non-atomic
    // pipeline
    val r2 = pipe.runJob(spec)
    assert(r2.error.isEmpty && r2.rows === 3L)
    assert(status() === EtlJob.Done)
    assert(tableRows() === Seq(("2025-01-01", 95000.0),
      ("2025-01-02", 96000.0), ("2025-01-03", 97000.0)))
  }
}
