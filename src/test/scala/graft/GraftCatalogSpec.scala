package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftSink

/** The pure-SQL lifecycle of graftsink tables through the registered
  * TableCatalog: DDL, DML, time travel, schema evolution, and
  * interop with the path-based API — all `spark.sql`, no DataFrame
  * writer in the main flow.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = tmpDir("graft_catalog")
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", r)
    r
  }

  test("CREATE / INSERT / SELECT / INSERT OVERWRITE / DROP through SQL") {
    root
    spark.sql("CREATE NAMESPACE graft.core")
    spark.sql("CREATE TABLE graft.core.acct (k BIGINT, s STRING)")
    // empty from birth, but EXISTS (v0 manifest)
    assert(spark.sql("SELECT * FROM graft.core.acct").count() === 0L)
    spark.sql("INSERT INTO graft.core.acct VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.core.acct VALUES (3, 'c')")
    assert(spark.sql("SELECT k FROM graft.core.acct ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    spark.sql("INSERT OVERWRITE graft.core.acct VALUES (9, 'z')")
    assert(spark.sql("SELECT k, s FROM graft.core.acct")
      .as[(Long, String)].collect().toSeq === Seq((9L, "z")))
    assert(spark.sql("SHOW TABLES IN graft.core").collect()
      .map(_.getString(1)).toSet === Set("acct"))
    spark.sql("DROP TABLE graft.core.acct")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.core.acct").collect()
    }
  }

  test("VERSION AS OF time travel through SQL, including across a " +
    "schema change") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    spark.sql("CREATE TABLE graft.tt.h (k BIGINT, s STRING)")   // v0
    spark.sql("INSERT INTO graft.tt.h VALUES (1, 'a')")          // v1
    spark.sql("INSERT INTO graft.tt.h VALUES (2, 'b')")          // v2
    assert(spark.sql("SELECT k FROM graft.tt.h VERSION AS OF 1")
      .as[Long].collect().toSeq === Seq(1L))
    assert(spark.sql("SELECT count(*) FROM graft.tt.h VERSION AS OF 0")
      .as[Long].head() === 0L)
    spark.sql("ALTER TABLE graft.tt.h ADD COLUMN score DOUBLE")  // v3
    spark.sql("INSERT INTO graft.tt.h VALUES (3, 'c', 0.5)")     // v4
    // latest: evolved shape, old rows null-filled
    assert(spark.sql(
      "SELECT k, score FROM graft.tt.h ORDER BY k")
      .as[(Long, Option[Double])].collect().toSeq ===
      Seq((1L, None), (2L, None), (3L, Some(0.5))))
    // pinned BEFORE the evolution: the old shape, no score column
    assert(spark.sql("SELECT * FROM graft.tt.h VERSION AS OF 2")
      .columns.toSeq === Seq("k", "s"))
  }

  test("DELETE FROM WHERE is a copy-on-write version: atomic, " +
    "time-travelable, exact") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.del")
    spark.sql("CREATE TABLE graft.del.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.del.t VALUES " +
      "(1, 'keep'), (2, 'drop'), (3, 'keep'), (4, 'drop'), (5, NULL)")
    spark.sql("DELETE FROM graft.del.t WHERE s = 'drop'")
    // null-semantics: WHERE s = 'drop' is NULL for row 5 -> survives
    assert(spark.sql("SELECT k FROM graft.del.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L, 5L))
    spark.sql("DELETE FROM graft.del.t WHERE k >= 3 AND k <= 4")
    assert(spark.sql("SELECT k FROM graft.del.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 5L))
    // the pre-delete state is one VERSION AS OF away
    val dir = s"$root/del/t"
    val versions = GraftSink.latestVersion(spark, dir).get
    assert(spark.sql(
      s"SELECT count(*) FROM graft.del.t VERSION AS OF ${versions - 2}")
      .as[Long].head() === 5L)
  }

  test("catalog tables and path-based reads interoperate on the same " +
    "manifests") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mix")
    spark.sql("CREATE TABLE graft.mix.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.mix.t VALUES (1, 'a')")
    // path API sees the catalog's writes...
    val dir = s"$root/mix/t"
    assert(spark.read.format("graftsink").load(dir)
      .select("k").as[Long].collect().toSeq === Seq(1L))
    // ...and the catalog sees path-API appends
    Seq((2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)
    assert(spark.sql("SELECT k FROM graft.mix.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // metadata COUNT(*) also rides SQL: zero readers
    val before = GraftSink.readersCreated.get()
    assert(spark.sql("SELECT count(*) FROM graft.mix.t")
      .as[Long].head() === 2L)
    assert(GraftSink.readersCreated.get() === before)
  }

  test("UPDATE and MERGE INTO rewrite copy-on-write; complex DELETEs " +
    "fall back to the row-level path") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
    spark.sql("CREATE TABLE graft.rl.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.rl.t VALUES " +
      "(1, 'aa'), (2, 'bbb'), (3, 'cccc')")
    // UPDATE
    spark.sql("UPDATE graft.rl.t SET s = upper(s) WHERE k >= 2")
    assert(spark.sql("SELECT s FROM graft.rl.t ORDER BY k")
      .as[String].collect().toSeq === Seq("aa", "BBB", "CCCC"))
    // MERGE INTO: one matched update, one not-matched insert
    Seq((3L, "merged"), (4L, "new")).toDF("k", "s")
      .createOrReplaceTempView("mrg_src")
    spark.sql("""MERGE INTO graft.rl.t AS t USING mrg_src AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.s = s.s
      WHEN NOT MATCHED THEN INSERT (k, s) VALUES (s.k, s.s)""")
    assert(spark.sql("SELECT k, s FROM graft.rl.t ORDER BY k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "aa"), (2L, "BBB"), (3L, "merged"), (4L, "new")))
    // a DELETE the filter translation can't express (function call)
    // rides the row-level rewrite instead of being refused:
    // len('CCCC'->'merged')=6 and len('new')=3 — only k=3 goes
    spark.sql("DELETE FROM graft.rl.t WHERE length(s) > 3")
    assert(spark.sql("SELECT k FROM graft.rl.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 4L))
    // every DML step above is one more time-travelable version
    assert(GraftSink.latestVersion(spark, s"$root/rl/t").get >= 4)
  }

  test("row-level rewrites are FILE-granular: files the condition " +
    "cannot touch are carried, not rewritten") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fg")
    spark.sql("CREATE TABLE graft.fg.t (k BIGINT, s STRING)")
    // three single-row files with disjoint key bounds
    for (i <- Seq(10L, 20L, 30L))
      spark.sql(s"INSERT INTO graft.fg.t VALUES ($i, 'v$i')")
    val dir = s"$root/fg/t"
    val before = GraftSink.latestManifest(spark, dir).get.files
      .map(_.name).toSet
    assert(before.size === 3)
    spark.sql("UPDATE graft.fg.t SET s = 'HIT' WHERE k = 20")
    val after = GraftSink.latestManifest(spark, dir).get.files
      .map(_.name).toSet
    // the k=10 and k=30 files survive by NAME (never rewritten); only
    // the k=20 file was replaced
    assert((before -- after).size === 1,
      s"exactly one file replaced: before=$before after=$after")
    assert((before intersect after).size === 2)
    assert(spark.sql("SELECT s FROM graft.fg.t ORDER BY k")
      .as[String].collect().toSeq === Seq("v10", "HIT", "v30"))
  }

  test("MERGE INTO is runtime-group-filtered: files the ON keys never " +
    "touch survive by name") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rt")
    spark.sql("CREATE TABLE graft.rt.t (k BIGINT, s STRING)")
    for (i <- Seq(10L, 20L, 30L))
      spark.sql(s"INSERT INTO graft.rt.t VALUES ($i, 'v$i')")
    val dir = s"$root/rt/t"
    val before = GraftSink.latestManifest(spark, dir).get.files
      .map(_.name).toSet
    assert(before.size === 3)
    // the ON key hits only the k=20 file; MERGE has no statically
    // pushable predicate, so survival proves the runtime subquery
    // narrowed the rewrite to that one file
    Seq((20L, "MERGED")).toDF("k", "s").createOrReplaceTempView("rt_src")
    spark.sql("""MERGE INTO graft.rt.t AS t USING rt_src AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.s = s.s""")
    val after = GraftSink.latestManifest(spark, dir).get.files
      .map(_.name).toSet
    assert((before intersect after).size === 2,
      s"untouched files must survive the MERGE by name: " +
        s"before=$before after=$after")
    assert(spark.sql("SELECT s FROM graft.rt.t ORDER BY k")
      .as[String].collect().toSeq === Seq("v10", "MERGED", "v30"))
  }

  test("the reference's incremental-upsert loop on the lakehouse: " +
    "metadata watermark probe, delta MERGE, time-travelable history") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.wh")
    spark.sql("CREATE TABLE graft.wh.prices (day BIGINT, price DOUBLE)")
    spark.sql("INSERT INTO graft.wh.prices VALUES (1, 95000.0), (2, 96000.0)")
    // A1 MAX watermark: answered from manifest bounds, ZERO file opens
    val before = GraftSink.readersCreated.get()
    val watermark = spark.sql("SELECT max(day) FROM graft.wh.prices")
      .as[Long].head()
    assert(watermark === 2L)
    assert(GraftSink.readersCreated.get() === before,
      "the watermark probe must be metadata")
    // incremental batch: a stale repeat of day 2 plus a new day 3 —
    // the watermark keeps the stale row out, MERGE applies the delta
    Seq((2L, 1.0), (3L, 97000.0)).toDF("day", "price")
      .filter(col("day") > watermark)
      .createOrReplaceTempView("price_delta")
    spark.sql("""MERGE INTO graft.wh.prices AS t USING price_delta AS s
      ON t.day = s.day
      WHEN MATCHED THEN UPDATE SET t.price = s.price
      WHEN NOT MATCHED THEN INSERT (day, price) VALUES (s.day, s.price)""")
    assert(spark.sql("SELECT day, price FROM graft.wh.prices ORDER BY day")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 95000.0), (2L, 96000.0), (3L, 97000.0)))
    // every sync round is one version; the pre-merge state is a
    // VERSION AS OF away (the reference's Postgres target has no
    // equivalent of this)
    val v = GraftSink.latestVersion(spark, s"$root/wh/prices").get
    assert(spark.sql(
      s"SELECT count(*) FROM graft.wh.prices VERSION AS OF ${v - 1}")
      .as[Long].head() === 2L)
  }

  test("DDL guardrails: duplicate create, unknown table, rename") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.g")
    spark.sql("CREATE TABLE graft.g.a (k BIGINT)")
    intercept[Exception] { spark.sql("CREATE TABLE graft.g.a (k BIGINT)") }
    spark.sql("CREATE TABLE IF NOT EXISTS graft.g.a (k BIGINT)") // no-op
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.g.nope").collect()
    }
    spark.sql("INSERT INTO graft.g.a VALUES (7)")
    // the RENAME target is catalog-relative (same catalog by contract)
    spark.sql("ALTER TABLE graft.g.a RENAME TO g.b")
    assert(spark.sql("SELECT k FROM graft.g.b").as[Long].head() === 7L)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.g.a").collect()
    }
  }

  test("CALL system.vacuum expires versions through SQL; a pinned " +
    "VERSION AS OF read of a vacuumed version fails loudly") {
    assert(root.nonEmpty) // force catalog registration first
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.m")
    spark.sql("CREATE TABLE graft.m.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.m.t VALUES (1, 'a')")          // v1
    spark.sql("INSERT OVERWRITE graft.m.t VALUES (2, 'b')")     // v2
    spark.sql("INSERT INTO graft.m.t VALUES (3, 'c')")          // v3
    // the pinned version works before retention...
    assert(spark.sql("SELECT k FROM graft.m.t VERSION AS OF 1")
      .as[Long].collect().toSeq === Seq(1L))
    val row = spark.sql(
      "CALL graft.system.vacuum(table => 'm.t', keep_versions => 2, " +
        "grace_ms => 0)").collect().head
    assert(row.getString(0).split(",").nonEmpty)   // expired versions
    assert(row.getInt(1) >= 1)                     // v1's orphan file
    // ...and fails LOUDLY after: the manifest is gone, so the read
    // refuses — it can never serve partial data from surviving files
    val e = intercept[Exception] {
      spark.sql("SELECT k FROM graft.m.t VERSION AS OF 1").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    // the surviving pinned version and the head still read exactly
    assert(spark.sql("SELECT k FROM graft.m.t VERSION AS OF 2")
      .as[Long].collect().toSeq === Seq(2L))
    assert(spark.sql("SELECT k FROM graft.m.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(2L, 3L))
  }

  test("CALL system.compact merges small files through SQL; reads " +
    "carry over exactly") {
    assert(root.nonEmpty) // force catalog registration first
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.m2")
    spark.sql("CREATE TABLE graft.m2.t (k BIGINT)")
    (1 to 5).foreach(i =>
      spark.sql(s"INSERT INTO graft.m2.t VALUES ($i)"))
    val before = GraftSink.latestManifest(spark, s"$root/m2/t")
      .get.files.size
    val row = spark.sql(
      "CALL graft.system.compact(table => 'm2.t')").collect().head
    assert(row.getInt(0) >= 1, "at least one group merged")
    val after = GraftSink.latestManifest(spark, s"$root/m2/t")
      .get.files.size
    assert(after < before)
    assert(spark.sql("SELECT k FROM graft.m2.t ORDER BY k")
      .as[Long].collect().toSeq === (1L to 5L))
  }

  test("CALL system.cluster rewrites range-clustered through SQL") {
    assert(root.nonEmpty) // force catalog registration first
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.m3")
    spark.sql("CREATE TABLE graft.m3.t (k BIGINT, v BIGINT)")
    spark.range(2000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartition(6).writeTo("graft.m3.t").append()
    val row = spark.sql(
      "CALL graft.system.cluster(table => 'm3.t', by => 'k', " +
        "target_bytes => 8192)").collect().head
    assert(row.getInt(0) === 6 && row.getLong(2) === 2000L)
    assert(spark.sql("SELECT count(*) FROM graft.m3.t")
      .head.getLong(0) === 2000L)
    // clustered layout: a point probe opens 1 file (counter-gated in
    // GraftSinkSpec; here assert pruning narrowed below all files)
    val before = GraftSink.readersCreated.get()
    assert(spark.sql("SELECT count(*) FROM graft.m3.t WHERE k = 777")
      .head.getLong(0) === 1L)
    assert(GraftSink.readersCreated.get() - before < row.getInt(1).toLong)
  }

  test("metadata tables: SELECT FROM cat.ns.t.files / .history reads " +
    "manifest content with zero data-file readers") {
    assert(root.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.meta")
    spark.sql("CREATE TABLE graft.meta.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.meta.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.meta.t VALUES (3, 'c')")
    val before = GraftSink.readersCreated.get()
    val files = spark.sql(
      "SELECT file, rows, rewrite FROM graft.meta.t.files ORDER BY file")
      .collect()
    assert(files.length >= 2) // one or more files per insert
    assert(files.map(_.getLong(1)).sum === 3L)
    assert(files.forall(!_.getBoolean(2)))
    val hist = spark.sql(
      "SELECT version, files, rows FROM graft.meta.t.history " +
        "ORDER BY version").collect()
    assert(hist.map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    assert(hist.map(_.getLong(2)).toSeq === Seq(0L, 2L, 3L))
    assert(spark.sql("SELECT committed_at FROM graft.meta.t.history")
      .collect().forall(!_.isNullAt(0)))
    assert(GraftSink.readersCreated.get() === before,
      "metadata tables must not open data files")
    // .segments exposes the manifest-list layer itself WITHOUT
    // resolving a single segment: counts/rows come off the ref lines
    // (the 2-insert table is all-inline, so one "(inline)" row)
    GraftSink.clearSegmentCache()
    val segBefore = GraftSink.segmentReads.get()
    val segs = spark.sql(
      "SELECT segment, files, rows FROM graft.meta.t.segments").collect()
    assert(segs.map(_.getLong(2)).sum === 3L)
    assert(segs.map(_.getInt(1)).sum >= 2)
    assert(GraftSink.segmentReads.get() === segBefore,
      ".segments must serve from ref lines, never resolve segments")
    // a metadata suffix on a MISSING table still fails loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.meta.nope.files").collect()
    }
  }

  test("TIMESTAMP AS OF resolves the newest version committed at or " +
    "before the timestamp; pre-creation reads fail loudly") {
    assert(root.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tt2")
    val before = java.sql.Timestamp.from(java.time.Instant.now()
      .minusSeconds(5))
    spark.sql("CREATE TABLE graft.tt2.h (k BIGINT)")
    spark.sql("INSERT INTO graft.tt2.h VALUES (1)")
    Thread.sleep(1100) // manifest mod-times must separate the epochs
    val mid = java.sql.Timestamp.from(java.time.Instant.now())
    Thread.sleep(1100)
    spark.sql("INSERT INTO graft.tt2.h VALUES (2)")
    assert(spark.sql(
      s"SELECT k FROM graft.tt2.h TIMESTAMP AS OF '$mid' ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L))
    assert(spark.sql("SELECT k FROM graft.tt2.h ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft.tt2.h TIMESTAMP AS OF '$before'").collect()
    }
  }

  test("CALL system.restore republishes a prior version as the new " +
    "head; skipped-over history stays travelable; vacuumed fails loud") {
    assert(root.nonEmpty)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rb")
    spark.sql("CREATE TABLE graft.rb.t (k BIGINT)")           // v0
    spark.sql("INSERT INTO graft.rb.t VALUES (1)")            // v1
    spark.sql("INSERT OVERWRITE graft.rb.t VALUES (9)")       // v2
    val row = spark.sql(
      "CALL graft.system.restore(table => 'rb.t', version => 1)")
      .collect().head
    assert(row.getInt(0) === 1 && row.getInt(1) === 3)
    // the head is v1's content again...
    assert(spark.sql("SELECT k FROM graft.rb.t").as[Long]
      .collect().toSeq === Seq(1L))
    // ...the overwrite is still one VERSION AS OF away...
    assert(spark.sql("SELECT k FROM graft.rb.t VERSION AS OF 2")
      .as[Long].collect().toSeq === Seq(9L))
    // ...appends continue on top of the restored state
    spark.sql("INSERT INTO graft.rb.t VALUES (2)")
    assert(spark.sql("SELECT k FROM graft.rb.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // the restored files survive a vacuum (the new head references
    // them), and restoring a VACUUMED version fails loudly
    spark.sql("CALL graft.system.vacuum(table => 'rb.t', " +
      "keep_versions => 2, grace_ms => 0)")
    assert(spark.sql("SELECT k FROM graft.rb.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    val e = intercept[Exception] {
      spark.sql(
        "CALL graft.system.restore(table => 'rb.t', version => 2)")
        .collect()
    }
    assert(e.getMessage.contains("restore"), e.getMessage)
  }

  test("unknown procedures and missing tables fail loudly at CALL") {
    intercept[Exception] {
      spark.sql("CALL graft.system.no_such_proc()").collect()
    }
    val e = intercept[Exception] {
      spark.sql(
        "CALL graft.system.vacuum(table => 'nope.missing')").collect()
    }
    assert(e.getMessage != null)
  }

  test("tags: a named pin reads back as VERSION AS OF 'name', " +
    "survives vacuum, and re-enters retention when untagged") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tg")
    spark.sql("CREATE TABLE graft.tg.t (k BIGINT)")              // v0
    spark.sql("INSERT INTO graft.tg.t VALUES (1), (2)")          // v1
    // pin the corpus a "training run" saw
    val pinned = spark.sql(
      "CALL graft.system.tag(table => 'tg.t', name => 'run-a')")
      .collect().head
    assert(pinned.getString(0) === "run-a" && pinned.getInt(1) === 1)
    // history moves on
    spark.sql("INSERT INTO graft.tg.t VALUES (3)")               // v2
    spark.sql("INSERT OVERWRITE graft.tg.t VALUES (9)")          // v3
    spark.sql("INSERT INTO graft.tg.t VALUES (10)")              // v4
    // the tag reads the pinned snapshot by NAME
    assert(spark.sql("SELECT k FROM graft.tg.t VERSION AS OF 'run-a'")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // vacuum keep 2 would expire v1 — but the tag exempts it (v2
    // goes; its rows were overwritten away, nothing references them)
    spark.sql("CALL graft.system.vacuum(table => 'tg.t', " +
      "keep_versions => 2, grace_ms => 0)")
    assert(spark.sql("SELECT k FROM graft.tg.t VERSION AS OF 'run-a'")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L),
      "a tagged snapshot must survive retention")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.tg.t VERSION AS OF 2").collect()
    }
    // duplicate tag names are rejected; unknown tags read loudly
    intercept[Exception] {
      spark.sql(
        "CALL graft.system.tag(table => 'tg.t', name => 'run-a')")
        .collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.tg.t VERSION AS OF 'nope'")
        .collect()
    }
    // untag releases the pin: the next vacuum expires v1 for real
    assert(spark.sql(
      "CALL graft.system.untag(table => 'tg.t', name => 'run-a')")
      .collect().head.getBoolean(0))
    spark.sql("CALL graft.system.vacuum(table => 'tg.t', " +
      "keep_versions => 2, grace_ms => 0)")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.tg.t VERSION AS OF 'run-a'")
        .collect()
    }
    // the live table was never disturbed
    assert(spark.sql("SELECT k FROM graft.tg.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(9L, 10L))
  }

  test("tags through the path API and the .tags metadata table") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tg2")
    spark.sql("CREATE TABLE graft.tg2.t (k BIGINT)")            // v0
    spark.sql("INSERT INTO graft.tg2.t VALUES (5)")             // v1
    GraftSink.tag(spark, s"$root/tg2/t", "snap", Some(1))
    spark.sql("INSERT INTO graft.tg2.t VALUES (6)")             // v2
    // path-based read resolves the tag through the version option
    assert(spark.read.format("graftsink").option("version", "snap")
      .load(s"$root/tg2/t").as[Long].collect().toSeq === Seq(5L))
    // the .tags metadata table lists the pin
    assert(spark.sql("SELECT name, version FROM graft.tg2.t.tags")
      .as[(String, Int)].collect().toSeq === Seq(("snap", 1)))
  }

  test("RENAME COLUMN is a manifest-only publish: data bytes " +
    "untouched, bounds skip under the new name, history keeps the old") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rn")
    val dir = s"$root/rn/t"
    // seed key-banded files through the path API so bounds are tight
    spark.range(0, 8000)
      .select(col("id").as("k"), (col("id") * 2.0).as("v"))
      .repartitionByRange(8, col("k"))
      .write.format("graftsink").mode("overwrite").save(dir)
    val bytesBefore = {
      val d = new java.io.File(s"$dir/data")
      d.listFiles().map(f => f.getName -> f.length()).toMap
    }
    spark.sql("ALTER TABLE graft.rn.t RENAME COLUMN k TO key")  // v1
    // schema + data through the new name
    assert(spark.sql("SELECT * FROM graft.rn.t").columns.toSeq
      === Seq("key", "v"))
    assert(spark.sql("SELECT sum(key) FROM graft.rn.t").as[Long].head()
      === (0L until 8000L).sum)
    // not one data byte moved
    val bytesAfter = {
      val d = new java.io.File(s"$dir/data")
      d.listFiles().map(f => f.getName -> f.length()).toMap
    }
    assert(bytesAfter === bytesBefore, "rename must not rewrite data")
    // file skipping rides the RENAMED stats keys: a narrow probe on
    // `key` opens ~1 of the 8 band files
    val before = GraftSink.readersCreated.get()
    assert(spark.sql(
      "SELECT count(*) FROM graft.rn.t WHERE key >= 100 AND key < 200")
      .as[Long].head() === 100L)
    assert(GraftSink.readersCreated.get() - before <= 2L,
      "bounds must prune under the renamed key")
    // metadata MAX under the new name, zero file opens
    val b2 = GraftSink.readersCreated.get()
    assert(spark.sql("SELECT max(key) FROM graft.rn.t")
      .as[Long].head() === 7999L)
    assert(GraftSink.readersCreated.get() === b2)
    // history: the pre-rename version still reads the OLD name
    assert(spark.sql("SELECT * FROM graft.rn.t VERSION AS OF 0")
      .columns.toSeq === Seq("k", "v"))
    // appends under the new shape coexist with old-named files
    spark.sql("INSERT INTO graft.rn.t VALUES (9000, 1.5)")
    assert(spark.sql(
      "SELECT count(*) FROM graft.rn.t WHERE key = 9000")
      .as[Long].head() === 1L)
  }

  test("DROP COLUMN hides the field without rewriting files; the " +
    "name stays haunted until a full rewrite frees it") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dc")
    spark.sql("CREATE TABLE graft.dc.t (k BIGINT, junk STRING, " +
      "v DOUBLE)")
    spark.sql("INSERT INTO graft.dc.t VALUES (1, 'x', 0.5), " +
      "(2, 'y', 1.5)")
    spark.sql("ALTER TABLE graft.dc.t DROP COLUMN junk")
    assert(spark.sql("SELECT * FROM graft.dc.t").columns.toSeq
      === Seq("k", "v"))
    assert(spark.sql("SELECT k, v FROM graft.dc.t ORDER BY k")
      .as[(Long, Double)].collect().toSeq
      === Seq((1L, 0.5), (2L, 1.5)))
    // post-drop appends write the narrow shape
    spark.sql("INSERT INTO graft.dc.t VALUES (3, 2.5)")
    assert(spark.sql("SELECT count(*) FROM graft.dc.t")
      .as[Long].head() === 3L)
    // re-ADD of the dropped name: rejected while its bytes live
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dc.t ADD COLUMN junk STRING")
    }
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    // RENAME onto the haunted name: same refusal
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dc.t RENAME COLUMN v TO junk")
    }
    assert(e2.getMessage.contains("cluster"), e2.getMessage)
    // a full rewrite lays fresh files without the column...
    GraftSink.cluster(spark, s"$root/dc/t", Seq("k"))
    // ...freeing the name: the re-added column reads null everywhere,
    // never the old 'x'/'y' bytes
    spark.sql("ALTER TABLE graft.dc.t ADD COLUMN junk STRING")
    assert(spark.sql(
      "SELECT count(*) FROM graft.dc.t WHERE junk IS NOT NULL")
      .as[Long].head() === 0L)
  }
}
