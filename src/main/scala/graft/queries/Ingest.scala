package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** The ingestion seam under the oracle gate: a declared query that reads
  * its input THROUGH the DataSource V2 `format("dune")` connector
  * ([[graft.sources.DuneDataSource]]) with a pushed watermark predicate —
  * the rebuild of the reference's server-side `date` parameter
  * (`dune_extractor.py:57-59`) exercised end-to-end by the driver's
  * correctness gate, not only by unit specs.
  */
object Ingest {

  val DuneQueryId = 900001L

  /** Materialize the orders table as the JSON-lines payload the dune
    * connector replays (the shape of Dune's `result.rows`,
    * `dune_extractor.py:96-98`), once per sf dir, cached in tmp.
    * Distributed write + staged rename — no driver-side collect.
    *
    * The cache key is a 64-bit hash of the source parquet's full path
    * PLUS its length and mtime: regenerated testdata invalidates the
    * fixture automatically, and two sf dirs can't collide the way a
    * 32-bit `String.hashCode` of the path alone could.
    */
  private[queries] def ordersFixture(spark: SparkSession, dir: String): String = {
    val srcPath = new Path(s"$dir/orders.parquet")
    val srcFs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = srcFs.getFileStatus(srcPath)
    val key = java.lang.Long.toHexString(graft.expressions.Kernels.fnv1a64(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        s"$dir|${st.getLen}|${st.getModificationTime}")))
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_dune_fixture_$key"
    val dest = new Path(s"$base/$DuneQueryId.json")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dest)) {
      val staging = new Path(s"$base/__staging")
      fs.delete(staging, true)
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"))
        .coalesce(1).write.mode("overwrite").json(staging.toString)
      val part = fs.listStatus(staging).map(_.getPath)
        .find(_.getName.startsWith("part-"))
        .getOrElse(sys.error(s"no part file written under $staging"))
      fs.mkdirs(dest.getParent)
      if (!fs.rename(part, dest))
        sys.error(s"rename $part -> $dest failed")
      fs.delete(staging, true)
    }
    base
  }

  /** Declared source schema — skips the connector's O(payload)
    * inference pre-pass (the declared-StructType policy, SURVEY §7).
    */
  private val duneSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderdate", StringType),
    StructField("o_totalprice", DoubleType)))

  /** Monthly order revenue past a watermark, read through the dune
    * connector: the `o_orderdate > watermark` predicate is ACCEPTED by
    * the scan (`PushedFilters` in the scan description — PlanSpec
    * asserts it lands there, not in the plan above), so only the delta
    * is parsed out of the payload, exactly where the reference's REST
    * parameter cut it.
    */
  private def duneSource(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("dune").schema(duneSchema)
      .option("path", ordersFixture(spark, dir))
      .option("queryId", DuneQueryId.toString)
      .load()
      .filter(col("o_orderdate") > "1996-12-31")
      .groupBy(substring(col("o_orderdate"), 1, 7).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("month")

  private val duneSourceSql =
    """SELECT substr(strftime(o_orderdate, '%Y-%m-%d'), 1, 7) AS month,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |WHERE strftime(o_orderdate, '%Y-%m-%d') > '1996-12-31'
      |GROUP BY 1 ORDER BY month""".stripMargin

  /** The reference's A1 (MAX watermark) + A2 (COUNT verification)
    * probes computed AT the source: an ungrouped max/count over the
    * connector is pushed PARTIALLY
    * ([[graft.sources.DuneDataSource]]'s SupportsPushDownAggregates) —
    * every byte-range split folds its rows to one partial row and the
    * final aggregate merges #splits rows, so no fact rows ever
    * materialize into Spark AND the probe keeps the scan's
    * parallelism. PlanSpec asserts the scan itself emits the partial
    * aggregate schema.
    */
  private def duneWatermark(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("dune").schema(duneSchema)
      .option("path", ordersFixture(spark, dir))
      .option("queryId", DuneQueryId.toString)
      .load()
      .filter(col("o_orderdate") > "1996-12-31")
      .agg(max(col("o_orderdate")).as("max_watermark"),
        count(lit(1)).as("n_rows"),
        round(max(col("o_totalprice")), 2).as("max_price"))

  private val duneWatermarkSql =
    """SELECT max(strftime(o_orderdate, '%Y-%m-%d')) AS max_watermark,
      |  count(*) AS n_rows,
      |  round(max(o_totalprice), 2) AS max_price
      |FROM orders
      |WHERE strftime(o_orderdate, '%Y-%m-%d') > '1996-12-31'""".stripMargin

  /** Transactional DSv2 SINK round trip
    * ([[graft.sources.GraftSinkDataSource]], `format("graftsink")`):
    * the engine's own V2 write protocol carries an overwrite (manifest
    * v0: the F orders) then an append (manifest v1 carries v0's files
    * forward untouched and adds the P orders) — task-staged files,
    * task commit messages, ONE manifest rename as the commit point.
    * The read resolves the LATEST manifest only. Oracle: the same
    * union from the raw orders table — the sink must neither lose,
    * duplicate, nor mutate a row across the write/commit/read cycle
    * (money compared in exact cents).
    */
  private val sinkSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededSink(spark: SparkSession, dir: String): String =
    sinkSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_sink_seed").toString + "/orders_sink"
      val o = Tables(spark, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
          "o_orderdate")
      o.filter(col("o_orderstatus") === "F")
        .write.format("graftsink").mode("overwrite").save(p)
      o.filter(col("o_orderstatus") === "P")
        .write.format("graftsink").mode("append").save(p)
      p
    })

  private def dsv2Sink(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededSink(spark, dir))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        max(to_date(col("o_orderdate")).cast("string")).as("last_day"))
      .orderBy("status")

  private val dsv2SinkSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS last_day
      |FROM orders WHERE o_orderstatus IN ('F', 'P')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Change-feed read over the seeded sink: `changesFrom = 0` scans
    * ONLY the files the v1 append added (the P orders) — incremental
    * consumption of an append-only table with no rescan of the carried
    * v0 files. The oracle recomputes the same slice from the raw
    * orders table; at 100 TB this is the downstream-ETL primitive that
    * replaces "diff two snapshots" (two full scans + an anti-join)
    * with a manifest file-set difference (driver-side metadata only).
    */
  private def sinkChanges(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").option("changesFrom", 0)
      .load(seededSink(spark, dir))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        max(to_date(col("o_orderdate")).cast("string")).as("last_day"))
      .orderBy("status")

  private val sinkChangesSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS last_day
      |FROM orders WHERE o_orderstatus = 'P'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Manifest-bounds file skipping through the declared surface: a
    * SECOND sink seed laid out range-clustered on o_orderkey (16
    * files, disjoint key bands — the layout where per-file [lo, hi]
    * bounds bite), probed with a key-range predicate. The scan's
    * pushFilters prune to the intersecting band files; Spark re-applies
    * the predicate above (advisory pushdown), and the oracle
    * recomputes from the raw table — results must be exact no matter
    * how many files were skipped. GraftSinkSpec pins the actual
    * opened-file counts with the reader counter.
    */
  private val skipSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededSkipSink(spark: SparkSession, dir: String): String =
    skipSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_sink_skip_seed").toString + "/orders"
      Tables(spark, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(16, col("o_orderkey"))
        .write.format("graftsink").mode("overwrite").save(p)
      p
    })

  /** Segment-level pruning end-to-end (round 7's manifest-list
    * layer): the seed lands as TWO segments with disjoint key ranges —
    * a 70-file low band then a 34-file high band (34 ≥ 70/2, so the
    * geometric merge keeps them separate) — and the declared probe
    * targets the top sixth of the keyspace, so a cold driver resolves
    * ONLY the high segment's entry list before per-file skipping even
    * starts (counter-gated in GraftSinkSpec; here the VALUES are
    * oracle-checked against the raw orders table). At 10⁵ files this
    * is the difference between parsing the whole manifest per
    * selective query and parsing the one matching segment.
    */
  private val segSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededSegmentedSink(spark: SparkSession,
      dir: String): String =
    segSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_sink_seg_seed").toString + "/orders"
      val o = Tables(spark, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val mx = o.agg(max("o_orderkey")).head.getLong(0)
      val cut = mx * 2 / 3
      o.filter(col("o_orderkey") <= cut)
        .repartitionByRange(70, col("o_orderkey"))
        .write.format("graftsink").mode("overwrite").save(p)
      o.filter(col("o_orderkey") > cut)
        .repartitionByRange(34, col("o_orderkey"))
        .write.format("graftsink").mode("append").save(p)
      p
    })

  private def sinkSegments(spark: SparkSession, dir: String): DataFrame = {
    val p = seededSegmentedSink(spark, dir)
    val mx = Tables(spark, dir, "orders")
      .agg(max("o_orderkey")).head.getLong(0)
    spark.read.format("graftsink").load(p)
      .filter(col("o_orderkey") > lit(mx * 5 / 6))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"))
      .orderBy("status")
  }

  private val sinkSegmentsSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders
      |WHERE o_orderkey > (SELECT max(o_orderkey) * 5 / 6 FROM orders)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private def sinkSkip(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededSkipSink(spark, dir))
      .filter(col("o_orderkey") >= 1000L && col("o_orderkey") < 2000L)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"))
      .orderBy("status")

  private val sinkSkipSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** NaN rows through the sink's NaN-aware manifest bounds, under the
    * oracle: prices are deterministically poisoned with NaN, the table
    * lands range-clustered ON the poisoned column (NaN sorts above
    * every double, so the NaN rows concentrate in the top band file
    * whose recorded interval is [finite lo, NaN]), and the declared
    * query range-probes that column — file skipping prunes the low
    * bands by their finite bounds while every NaN row must survive
    * (Spark and DuckDB agree `NaN > c` for any finite c). A
    * naively-tracked hi would silently drop the NaN band here and
    * break the hash. Spark side reads the SINK; oracle recomputes
    * from raw parquet.
    */
  private val nanSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededNanSink(spark: SparkSession, dir: String): String =
    nanSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_sink_nan_seed").toString + "/orders"
      Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 97 === 0, lit(Double.NaN))
            .otherwise(col("o_totalprice").cast("double")).as("v"))
        .repartitionByRange(16, col("v"))
        .write.format("graftsink").mode("overwrite").save(p)
      p
    })

  private def sinkNan(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededNanSink(spark, dir))
      .filter(col("v") > 200000.0)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(isnan(col("v")), lit(1))).as("n_nan"),
        sum(when(not(isnan(col("v"))),
          round(col("v") * 100).cast("long"))).as("finite_cents"))
      .orderBy("status")

  private val sinkNanSql =
    """SELECT o_orderstatus AS status, count(*) AS n_rows,
      |  count(CASE WHEN isnan(v) THEN 1 END) AS n_nan,
      |  CAST(sum(CASE WHEN NOT isnan(v)
      |    THEN CAST(round(v * 100) AS BIGINT) END) AS BIGINT)
      |    AS finite_cents
      |FROM (SELECT o_orderstatus,
      |        CASE WHEN o_orderkey % 97 = 0 THEN CAST('NaN' AS DOUBLE)
      |             ELSE CAST(o_totalprice AS DOUBLE) END AS v
      |      FROM orders) t
      |WHERE v > 200000.0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The TableCatalog surface end-to-end in one declared query
    * ([[graft.sources.GraftCatalog]]): CREATE TABLE, INSERT INTO from
    * the raw orders, a copy-on-write DELETE of the low-priority slice,
    * and the final aggregate — every step pure Spark SQL against the
    * registered catalog (no DataFrame writer). The oracle recomputes
    * the same aggregate from raw orders WITH the delete predicate
    * applied, so the DML path must be exact: a half-applied delete or
    * a lost insert breaks the hash.
    */
  private val catalogSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sqlCatalog(spark: SparkSession, dir: String): DataFrame = {
    catalogSeeds.computeIfAbsent(dir, { d =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_catalog_seed").toString
      spark.conf.set("spark.sql.catalog.graftq",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftq.root", root)
      Tables(spark, d, "orders").createOrReplaceTempView("raw_orders")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftq.wh")
      spark.sql("CREATE TABLE graftq.wh.orders " +
        "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, " +
        "o_orderpriority STRING)")
      spark.sql("INSERT INTO graftq.wh.orders SELECT o_orderkey, " +
        "o_orderstatus, o_totalprice, o_orderpriority FROM raw_orders")
      spark.sql(
        "DELETE FROM graftq.wh.orders WHERE o_orderpriority = '5-LOW'")
      root
    })
    spark.sql("""SELECT o_orderstatus AS status, count(*) AS n_orders,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS total_cents
      FROM graftq.wh.orders GROUP BY 1 ORDER BY 1""")
  }

  private val sqlCatalogSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders WHERE o_orderpriority <> '5-LOW'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** COLUMN STATISTICS under the oracle gate: orders seed a catalog
    * graftsink table across several files, and the `.stats` metadata
    * table — the same merged per-file NDV-sketch + null-count feed
    * the scan reports to CBO (CboSpec proves the join reorder) — must
    * equal DuckDB's `count(DISTINCT …)` EXACTLY for low-cardinality
    * columns: their per-file sketches stay in the sparse-exact regime
    * and sparse merges are set union, so the table-level number is
    * not an estimate. The seed also requires `ndv_exact` to say so.
    */
  private val colstatsSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sinkColstats(spark: SparkSession, dir: String): DataFrame = {
    colstatsSeeds.computeIfAbsent(dir, { d =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_colstats_seed").toString
      spark.conf.set("spark.sql.catalog.graftcs",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftcs.root", root)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcs.wh")
      Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"))
        .repartition(4) // several files -> a real sketch MERGE
        .write.format("graftsink").mode("overwrite")
        .save(s"$root/wh/orders")
      val exact = spark.sql("SELECT `column`, ndv_exact FROM " +
        "graftcs.wh.orders.stats WHERE `column` IN " +
        "('o_orderstatus', 'o_orderpriority')").collect()
      require(exact.length == 2 && exact.forall(_.getBoolean(1)),
        s"low-cardinality columns must merge sparse-EXACT: " +
          s"${exact.mkString(", ")}")
      root
    })
    spark.sql("""SELECT `column` AS col_name, ndv, null_count
      FROM graftcs.wh.orders.stats
      WHERE `column` IN ('o_orderstatus', 'o_orderpriority')
      ORDER BY col_name""")
  }

  private val sinkColstatsSql =
    """SELECT 'o_orderpriority' AS col_name,
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS ndv,
      |  CAST(count(*) - count(o_orderpriority) AS BIGINT) AS null_count
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus',
      |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
      |  CAST(count(*) - count(o_orderstatus) AS BIGINT)
      |FROM orders
      |ORDER BY col_name""".stripMargin

  /** Zero-rewrite schema evolution under the gate: most orders land
    * under the BIRTH shape, then `ALTER TABLE RENAME COLUMN` +
    * `DROP COLUMN` evolve the table as pure manifest publishes (the
    * positional line parser never matches the bytes' embedded keys,
    * so not one data file is rewritten — the 100 TB contract), then
    * the remaining orders insert through the NEW shape. The final
    * aggregate groups over old-shape and new-shape files together
    * through the renamed name; a rename that lost a file's identity,
    * stats key, or a row breaks the hash against the raw-table
    * oracle.
    */
  private val renameSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def renameEvolution(spark: SparkSession,
      dir: String): DataFrame = {
    renameSeeds.computeIfAbsent(dir, { d =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_rename_seed").toString
      spark.conf.set("spark.sql.catalog.graftr",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftr.root", root)
      Tables(spark, d, "orders")
        .createOrReplaceTempView("raw_orders_rn")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftr.wh")
      spark.sql("CREATE TABLE graftr.wh.o (o_orderkey BIGINT, " +
        "o_orderstatus STRING, o_totalprice DOUBLE, " +
        "o_orderpriority STRING)")
      spark.sql("INSERT INTO graftr.wh.o SELECT o_orderkey, " +
        "o_orderstatus, o_totalprice, o_orderpriority " +
        "FROM raw_orders_rn WHERE o_orderkey % 5 <> 0")
      spark.sql(
        "ALTER TABLE graftr.wh.o RENAME COLUMN o_totalprice TO price")
      spark.sql("ALTER TABLE graftr.wh.o DROP COLUMN o_orderpriority")
      spark.sql("INSERT INTO graftr.wh.o SELECT o_orderkey, " +
        "o_orderstatus, o_totalprice FROM raw_orders_rn " +
        "WHERE o_orderkey % 5 = 0")
      root
    })
    spark.sql("""SELECT o_orderstatus AS status, count(*) AS n_orders,
      CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
        AS total_cents
      FROM graftr.wh.o GROUP BY 1 ORDER BY 1""")
  }

  private val renameEvolutionSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** STRING-key file skipping through the declared surface: a sink
    * seeded with 64-char sha256 "block hashes" (the reference's
    * `block.hash` / `transaction_id` p_keys are exactly this shape,
    * `utils/database.py` p_key columns), range-clustered into 16 hash
    * bands. The manifest stores 16-char TRUNCATED bounds (lower bound
    * = truncated min; upper = truncated max, last char incremented
    * when truncation lost tail chars — Iceberg's truncate(16)
    * discipline), so a hash-prefix probe prunes to the intersecting
    * band files without the manifest ever carrying full keys. At
    * 100 TB: manifest size stays O(files·16 chars) while equality /
    * prefix lookups on hash keys open O(1) of millions of files.
    * GraftSinkSpec pins the opened-file counts; here the oracle pins
    * exactness (advisory pushdown — Spark re-applies the filter).
    */
  private val skipStrSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededSkipStrSink(spark: SparkSession, dir: String): String =
    skipStrSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_sink_skip_str_seed").toString + "/o"
      // engine-native cluster-on-write: the WRITE declares the range
      // distribution (RequiresDistributionAndOrdering) and Spark plans
      // the exchange — no manual repartition
      Tables(spark, d, "orders")
        .select(sha2(col("o_orderkey").cast("string"), 256).as("h"),
          col("o_orderkey"), col("o_totalprice"))
        .write.format("graftsink")
        .option("clusterBy", "h").option("clusterPartitions", 16)
        .mode("overwrite").save(p)
      p
    })

  private def sinkSkipStr(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededSkipStrSink(spark, dir))
      .filter(col("h").startsWith("00"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        min(col("h")).as("first_hash"))

  private val sinkSkipStrSql =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  min(sha256(CAST(o_orderkey AS VARCHAR))) AS first_hash
      |FROM orders
      |WHERE sha256(CAST(o_orderkey AS VARCHAR)) LIKE '00%'""".stripMargin

  /** GROUPED metadata aggregate through the declared surface: the
    * incremental loop's per-partition watermark probe. The sink is
    * value-clustered on o_orderstatus (one file set per status), so
    * `MAX(o_orderkey) GROUP BY o_orderstatus` folds entirely from
    * manifest rows — each file's bounds collapse to a single status
    * value with a recorded zero null count, making file→group
    * assignment provable at plan time. At 100 TB this answers "where
    * did each partition's incremental load reach?" with ZERO file
    * opens (GraftSinkSpec pins the reader counter; the oracle here
    * pins the values).
    */
  private val groupedMaxSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededGroupedSink(spark: SparkSession, dir: String): String =
    groupedMaxSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_sink_grouped_seed").toString + "/o"
      // one single-status partition per distinct status, built by
      // explicit filter+coalesce branches — NOT repartitionByRange:
      // range sampling is seeded off the global RDD id, so the file
      // layout (and with it the plan-time metadata-agg claim, hence
      // the PLANS.lock fingerprint) flipped between otherwise
      // identical runs. The union of coalesced branches gives exactly
      // one file per status deterministically, which also makes the
      // "zero file opens" claim hold by construction instead of by
      // sampling luck. Statuses are read from the data (3 values,
      // bounded driver collect), not hardcoded.
      val o = Tables(spark, d, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice"))
      val statuses = o.select(col("o_orderstatus")).distinct()
        .orderBy("o_orderstatus").collect().map(_.getString(0))
      statuses.map(s => o.filter(col("o_orderstatus") === s).coalesce(1))
        .reduce(_.unionAll(_))
        .write.format("graftsink").mode("overwrite").save(p)
      p
    })

  /** SNAPSHOT EXPORT under the oracle gate: orders seed a graftsink
    * table, [[graft.sources.GraftSink.cloneSnapshot]] exports its head
    * into a brand-new table (distributed byte copy + one
    * stats-carrying manifest publish, zero recompute), and THEN the
    * source is poisoned with extra rows — the declared query reads the
    * CLONE, so the oracle (computed from raw orders) proves the export
    * is the pinned snapshot, bit-exact and fully decoupled from the
    * source's later life. At 100 TB this is "ship training run X's
    * exact corpus to another team" as an embarrassingly parallel copy;
    * CloneSpec pins the carried-metadata laws (bounds skipping and
    * metadata-served COUNT work at the clone with zero readers).
    */
  private val cloneSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededClone(spark: SparkSession, dir: String): String =
    cloneSeeds.computeIfAbsent(dir, { d =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_sink_clone_seed").toString
      val src = s"$base/src"
      val dst = s"$base/clone"
      Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.format("graftsink").mode("overwrite").save(src)
      graft.sources.GraftSink.cloneSnapshot(spark, src, dst)
      // poison the SOURCE after the export: any leak into the clone
      // breaks the oracle row/sum/max equality
      Tables(spark, d, "orders")
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          col("o_custkey"), (col("o_totalprice") * 10).as("o_totalprice"))
        .limit(1000)
        .write.format("graftsink").mode("append").save(src)
      dst
    })

  private def sinkClone(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededClone(spark, dir))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        max(col("o_orderkey")).as("max_key"))

  /** INCREMENTAL REPLICATION under the oracle gate: half of orders
    * seed the source, [[graft.sources.GraftSink.cloneSnapshot]]
    * exports that half, the OTHER half appends to the source, and
    * [[graft.sources.GraftSink.cloneSync]] re-syncs — copying only the
    * delta files. The declared query reads the REPLICA; the oracle
    * aggregates ALL of raw orders, so any row the sync dropped,
    * duplicated, or blended across versions breaks the equality.
    * CloneSpec holds the per-op laws (delta counts, idempotence,
    * schema carry, model-walk equivalence); this is the end-to-end
    * driver-gated form.
    */
  private val cloneSyncSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededCloneSync(spark: SparkSession, dir: String): String =
    cloneSyncSeeds.computeIfAbsent(dir, { d =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_sink_clonesync_seed").toString
      val src = s"$base/src"
      val dst = s"$base/replica"
      val o = Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      o.filter(col("o_orderkey") % 2 === 0)
        .write.format("graftsink").mode("overwrite").save(src)
      graft.sources.GraftSink.cloneSnapshot(spark, src, dst)
      o.filter(col("o_orderkey") % 2 =!= 0)
        .write.format("graftsink").mode("append").save(src)
      graft.sources.GraftSink.cloneSync(spark, src, dst)
      dst
    })

  private def sinkCloneSync(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededCloneSync(spark, dir))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        max(col("o_orderkey")).as("max_key"))

  // same oracle as q_sink_clone: the replica must equal ALL of orders
  private val sinkCloneSyncSql =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  max(o_orderkey) AS max_key
      |FROM orders""".stripMargin

  private val sinkCloneSql =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  max(o_orderkey) AS max_key
      |FROM orders""".stripMargin

  /** INTEGRITY PROBE under the oracle gate: orders seed a sink table,
    * a compaction gives it multi-version history, a stray
    * crashed-writer-shaped file lands in data/, and
    * [[graft.sources.GraftSink.fsck]] must report EXACTLY
    * clean-with-one-orphan — a false positive on healthy history, a
    * missed orphan, or a miscounted reference fails the seed before
    * the oracle compare runs. The declared result then reads the
    * table back against the raw-orders oracle, so fsck's read-only
    * contract is gated too: a probe that mutated anything would break
    * the row equality.
    */
  private val fsckSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededFsck(spark: SparkSession, dir: String): String =
    fsckSeeds.computeIfAbsent(dir, { d =>
      val src = java.nio.file.Files
        .createTempDirectory("graft_sink_fsck_seed").toString + "/t"
      val o = Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      o.filter(col("o_orderkey") % 2 === 0)
        .write.format("graftsink").mode("overwrite").save(src)
      o.filter(col("o_orderkey") % 2 =!= 0)
        .write.format("graftsink").mode("append").save(src)
      graft.sources.GraftSink.compact(spark, src, smallBytes = 1L << 30)
      val fs = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(src, "data/wdeadbeef-stray"), false)
      try out.write("junk".getBytes("UTF-8")) finally out.close()
      val r = graft.sources.GraftSink.fsck(spark, src)
      require(r.clean, s"fsck flagged a healthy table: $r")
      require(r.unreferencedDataFiles == 1,
        s"fsck must count exactly the planted orphan: $r")
      require(r.filesChecked > 0 && r.versionsChecked >= 3,
        s"fsck must walk the full surviving history: $r")
      src
    })

  private def sinkFsck(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededFsck(spark, dir))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        max(col("o_orderkey")).as("max_key"))

  // the probed table holds ALL of orders (both halves, compacted)
  private val sinkFsckSql =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  max(o_orderkey) AS max_key
      |FROM orders""".stripMargin

  /** DEEP INTEGRITY PROBE under the oracle gate: same seed shape as
    * [[seededFsck]], then SAME-SIZE corruption — one bit flipped in a
    * pre-compaction file that only HISTORICAL versions reference. The
    * shallow existence+size probe must stay clean (it cannot see the
    * damage), `fsck(deep = true)` must re-hash the content
    * cluster-side and name EXACTLY the flipped file (its recorded
    * XXH64 no longer matches), and nothing may be declined as
    * unverified (every writer records a checksum). The declared
    * result reads the HEAD back against the raw-orders oracle — the
    * damage sits outside the head's file set, so the read must be
    * byte-exact, proving deep fsck localizes corruption instead of
    * poisoning the live table.
    */
  private val fsckDeepSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededFsckDeep(spark: SparkSession, dir: String): String =
    fsckDeepSeeds.computeIfAbsent(dir, { d =>
      val src = java.nio.file.Files
        .createTempDirectory("graft_sink_fsckdeep_seed").toString + "/t"
      val o = Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      o.filter(col("o_orderkey") % 2 === 0)
        .write.format("graftsink").mode("overwrite").save(src)
      o.filter(col("o_orderkey") % 2 =!= 0)
        .write.format("graftsink").mode("append").save(src)
      graft.sources.GraftSink.compact(spark, src, smallBytes = 1L << 30)
      val healthy = graft.sources.GraftSink.fsck(spark, src, deep = true)
      require(healthy.deepVerified,
        s"healthy table must deep-verify completely: $healthy")
      // victim: referenced by pre-compaction history only, not the head
      val headNames = graft.sources.GraftSink
        .latestManifest(spark, src).get.files.map(_.name).toSet
      val victim = graft.sources.GraftSink
        .manifestAt(spark, src, Some(1)).get.files
        .map(_.name).filterNot(headNames).headOption.getOrElse(
          sys.error("seed needs a history-only file to corrupt"))
      val p = new org.apache.hadoop.fs.Path(src, s"data/$victim")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val len = fs.getFileStatus(p).getLen
      val buf = new Array[Byte](len.toInt)
      val in = fs.open(p)
      try in.readFully(buf) finally in.close()
      buf(len.toInt / 2) = (buf(len.toInt / 2) ^ 0x01).toByte
      val out = fs.create(p, true)
      try out.write(buf) finally out.close()
      require(fs.getFileStatus(p).getLen == len,
        "the corruption must keep the recorded size")
      val shallow = graft.sources.GraftSink.fsck(spark, src)
      require(shallow.clean,
        s"the shallow probe cannot see same-size damage: $shallow")
      val deepR = graft.sources.GraftSink.fsck(spark, src, deep = true)
      require(!deepR.clean && deepR.checksumMismatches.size == 1 &&
        deepR.checksumMismatches.head.startsWith(victim) &&
        deepR.unverifiedFiles == 0,
        s"deep fsck must name exactly the flipped file: $deepR")
      src
    })

  private def sinkFsckDeep(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededFsckDeep(spark, dir))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        max(col("o_orderkey")).as("max_key"))

  // the head holds ALL of orders; the planted damage is history-only
  private val sinkFsckDeepSql =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  max(o_orderkey) AS max_key
      |FROM orders""".stripMargin

  /** FAILOVER PROMOTION under the oracle gate: half of orders seed a
    * source, a replica clones and promotes
    * ([[graft.sources.GraftSink.promote]]), the OTHER half lands as
    * post-failover LOCAL writes at the promoted head, and the
    * resurrected old source's sync must refuse loudly (the fence).
    * The declared query reads the promoted replica; the oracle
    * aggregates ALL of raw orders — a promotion that lost a local
    * write, let the old source clobber the head, or corrupted the
    * promotion commit breaks the equality.
    */
  private val promoteSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededPromote(spark: SparkSession, dir: String): String =
    promoteSeeds.computeIfAbsent(dir, { d =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_sink_promote_seed").toString
      val src = s"$base/src"
      val rep = s"$base/replica"
      val o = Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      o.filter(col("o_orderkey") % 2 === 0)
        .write.format("graftsink").mode("overwrite").save(src)
      graft.sources.GraftSink.cloneSnapshot(spark, src, rep)
      graft.sources.GraftSink.promote(spark, rep)
      // post-failover local writes at the promoted head
      o.filter(col("o_orderkey") % 2 =!= 0)
        .write.format("graftsink").mode("append").save(rep)
      // the resurrected old source is fenced off — and must say why
      val fenced =
        try { graft.sources.GraftSink.cloneSync(spark, src, rep); None }
        catch { case e: Exception => Some(e.getMessage) }
      require(fenced.exists(_.contains("PROMOTED")),
        s"old-source sync must refuse naming the promotion: $fenced")
      rep
    })

  private def sinkPromote(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededPromote(spark, dir))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        max(col("o_orderkey")).as("max_key"))

  // the promoted replica holds ALL of orders (cloned half + local half)
  private val sinkPromoteSql =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  max(o_orderkey) AS max_key
      |FROM orders""".stripMargin

  private def sinkGroupedMax(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink").load(seededGroupedSink(spark, dir))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(max(col("o_orderkey")).as("watermark"),
        count(lit(1)).as("n_orders"))
      .orderBy("status")

  private val sinkGroupedMaxSql =
    """SELECT o_orderstatus AS status, max(o_orderkey) AS watermark,
      |  count(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Z-ORDER clustering under the oracle gate: a scrambled two-column
    * sink rewritten on the Morton curve (`GraftSink.cluster(zorder)`),
    * then probed with a predicate on EACH dimension — the layout a
    * lexicographic sort can serve for only ONE of them. The oracle
    * recomputes both aggregates from the raw table, so the rewrite
    * must be row-exact regardless of how many files the bounds
    * pruned; GraftSinkSpec pins the both-dimensions-prune counters.
    * At 100 TB this is the maintenance pass that makes a second (and
    * third) frequent predicate column cheap without a second copy of
    * the table.
    */
  private val zorderSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededZorderSink(spark: SparkSession, dir: String): String =
    zorderSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_sink_zorder_seed").toString + "/o"
      Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(7) // scrambled on purpose
        .write.format("graftsink").mode("overwrite").save(p)
      val bytes = graft.sources.GraftSink
        .latestManifest(spark, p).get.files.map(_.bytes).sum
      graft.sources.GraftSink.cluster(spark, p,
        Seq("o_orderkey", "o_custkey"),
        targetBytes = math.max(1L, bytes / 16), zorder = true)
      p
    })

  private def sinkZorder(spark: SparkSession, dir: String): DataFrame = {
    val t = spark.read.format("graftsink")
      .load(seededZorderSink(spark, dir))
    val byKey = t.filter(col("o_orderkey") >= 1000L &&
        col("o_orderkey") < 3000L)
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .select(lit("by_orderkey").as("dim"), col("n"), col("cents"))
    val byCust = t.filter(col("o_custkey") >= 100L &&
        col("o_custkey") < 300L)
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .select(lit("by_custkey").as("dim"), col("n"), col("cents"))
    byKey.unionAll(byCust).orderBy("dim")
  }

  private val sinkZorderSql =
    """SELECT 'by_custkey' AS dim, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents
      |FROM orders WHERE o_custkey >= 100 AND o_custkey < 300
      |UNION ALL
      |SELECT 'by_orderkey' AS dim, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents
      |FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000
      |ORDER BY dim""".stripMargin

  /** INCREMENTAL OPTIMIZE under the oracle gate (round 14 —
    * [[graft.sources.GraftSink.cluster]] `incremental = true`): a
    * clustered sink table grows a KEY-LOCAL tail (the time-ordered
    * ingest shape), and the incremental pass folds the tail into
    * ONLY the clustered files whose bounds it overlaps. The seed
    * REQUIRES the survival proof — at least half the pre-existing
    * sorted run must come through byte-identical (same name, same
    * recorded checksum) and the rewrite must touch fewer rows than
    * the table — and the declared query reads the re-clustered table
    * against the raw-orders oracle, because layout maintenance must
    * be invisible to results. The tail deliberately OVERLAPS the run
    * boundary (keys above 9/10 of the seed cut re-land), so the
    * overlap-merge path itself is row-exact under the gate.
    */
  /** Metadata-only DELETE under the oracle gate ([[graft.sources
    * .GraftSinkTable.deleteVerdict]]): the seed lays orders into four
    * DETERMINISTIC key bands (filter + coalesce(1) per band — the
    * layout discipline that keeps plan fingerprints stable, never
    * repartitionByRange's RDD-id-seeded sampling), then issues a SQL
    * `DELETE WHERE o_orderkey <= cut` whose predicate every file's
    * bounds classify all-or-nothing. The seed PROVES the path taken:
    * zero `readersCreated` across the DELETE (no data file opened),
    * exactly one version bump, exactly the first band's file gone
    * from the live manifest with the other three carried BY NAME.
    * The declared query then reads the table against the raw-orders
    * oracle with the same integer-arithmetic cut — the O(1) delete
    * must also be EXACT.
    */
  private val metaDeleteSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededMetaDelete(spark: SparkSession,
      dir: String): String =
    metaDeleteSeeds.computeIfAbsent(dir, { d =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_meta_delete_seed").toString
      spark.conf.set("spark.sql.catalog.graftmd",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftmd.root", root)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftmd.wh")
      spark.sql("CREATE TABLE graftmd.wh.orders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")
      val p = s"$root/wh/orders"
      val o = Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val maxK = o.agg(max("o_orderkey")).head().getLong(0)
      val cut = maxK / 4
      Seq(
        col("o_orderkey") <= cut,
        col("o_orderkey") > cut && col("o_orderkey") <= 2 * cut,
        col("o_orderkey") > 2 * cut && col("o_orderkey") <= 3 * cut,
        col("o_orderkey") > 3 * cut
      ).foreach(band => o.filter(band).coalesce(1)
        .write.format("graftsink").mode("append").save(p))
      val before = graft.sources.GraftSink.latestManifest(spark, p).get
      require(before.files.size == 4, s"one file per band: $before")
      val doomed = before.files.minBy(_.bounds("o_orderkey")._1
        .asInstanceOf[Long]).name
      val readers = graft.sources.GraftSink.readersCreated.get()
      spark.sql(
        s"DELETE FROM graftmd.wh.orders WHERE o_orderkey <= $cut")
      require(graft.sources.GraftSink.readersCreated.get() == readers,
        "metadata-only DELETE must open ZERO data files")
      val after = graft.sources.GraftSink.latestManifest(spark, p).get
      require(after.version == before.version + 1 &&
        after.files.map(_.name).toSet ==
          before.files.map(_.name).toSet - doomed,
        s"exactly the all-match band drops; the rest carry by name")
      p
    })

  private def metaDelete(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink")
      .load(seededMetaDelete(spark, dir))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))

  private val metaDeleteSql =
    """WITH c AS (SELECT max(o_orderkey) // 4 AS cut FROM orders)
      |SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  min(o_orderkey) AS min_key,
      |  max(o_orderkey) AS max_key
      |FROM orders, c WHERE o_orderkey > cut""".stripMargin

  private val clusterIncrSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededClusterIncr(spark: SparkSession,
      dir: String): String =
    clusterIncrSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_cluster_incr_seed").toString + "/o"
      val o = Tables(spark, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val maxK = o.agg(max("o_orderkey")).head().getLong(0)
      val cut = maxK * 2 / 3
      o.filter(col("o_orderkey") <= cut)
        .repartition(5) // scrambled on purpose
        .write.format("graftsink").mode("overwrite").save(p)
      val bytes = graft.sources.GraftSink
        .latestManifest(spark, p).get.files.map(_.bytes).sum
      graft.sources.GraftSink.cluster(spark, p, Seq("o_orderkey"),
        targetBytes = math.max(1L, bytes / 12))
      val run1 = graft.sources.GraftSink
        .latestManifest(spark, p).get.files
      // the key-local tail, overlapping the run's top tenth
      o.filter(col("o_orderkey") > cut - cut / 10)
        .repartition(2)
        .write.format("graftsink").mode("append").save(p)
      val st = graft.sources.GraftSink.cluster(spark, p,
        Seq("o_orderkey"), targetBytes = math.max(1L, bytes / 12),
        incremental = true)
      val after = graft.sources.GraftSink
        .latestManifest(spark, p).get.files
      val survivors = run1.filter(f => after.exists(a =>
        a.name == f.name && a.checksum == f.checksum))
      require(survivors.size * 2 >= run1.size,
        s"most of the sorted run must survive byte-identical: " +
          s"${survivors.size}/${run1.size}")
      require(st.rows < after.map(_.rows).sum,
        s"the incremental pass must rewrite less than the table: $st")
      p
    })

  private def clusterIncr(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftsink")
      .load(seededClusterIncr(spark, dir))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"),
        max(col("o_orderkey")).as("max_key"))

  // the table holds orders <= 2/3·max plus a second copy of the
  // overlapping tail (> cut − cut/10) — integer division both sides
  private val clusterIncrSql =
    """WITH c AS (SELECT (max(o_orderkey) * 2) // 3 AS cut FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_totalprice FROM orders, c
      |  WHERE o_orderkey <= cut
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice FROM orders, c
      |  WHERE o_orderkey > cut - cut // 10)
      |SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  max(o_orderkey) AS max_key
      |FROM u""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_meta_delete", metaDelete, Some(metaDeleteSql)),
    NamedQuery("q_cluster_incr", clusterIncr, Some(clusterIncrSql)),
    NamedQuery("q_sql_catalog", sqlCatalog, Some(sqlCatalogSql)),
    NamedQuery("q_sink_colstats", sinkColstats, Some(sinkColstatsSql)),
    NamedQuery("q_rename_evolution", renameEvolution,
      Some(renameEvolutionSql)),
    NamedQuery("q_dune_source", duneSource, Some(duneSourceSql)),
    NamedQuery("q_dune_watermark", duneWatermark, Some(duneWatermarkSql)),
    NamedQuery("q_dsv2_sink", dsv2Sink, Some(dsv2SinkSql)),
    NamedQuery("q_sink_changes", sinkChanges, Some(sinkChangesSql)),
    NamedQuery("q_sink_skip", sinkSkip, Some(sinkSkipSql)),
    NamedQuery("q_sink_segments", sinkSegments, Some(sinkSegmentsSql)),
    NamedQuery("q_sink_nan", sinkNan, Some(sinkNanSql)),
    NamedQuery("q_sink_skip_str", sinkSkipStr, Some(sinkSkipStrSql)),
    NamedQuery("q_sink_grouped_max", sinkGroupedMax,
      Some(sinkGroupedMaxSql)),
    NamedQuery("q_sink_clone", sinkClone, Some(sinkCloneSql)),
    NamedQuery("q_sink_clone_sync", sinkCloneSync, Some(sinkCloneSyncSql)),
    NamedQuery("q_sink_fsck", sinkFsck, Some(sinkFsckSql)),
    NamedQuery("q_sink_fsck_deep", sinkFsckDeep, Some(sinkFsckDeepSql)),
    NamedQuery("q_sink_promote", sinkPromote, Some(sinkPromoteSql)),
    NamedQuery("q_sink_zorder", sinkZorder, Some(sinkZorderSql)))
}
