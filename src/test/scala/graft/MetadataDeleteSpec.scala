package graft

import org.apache.hadoop.fs.Path

import graft.sources.GraftSink

/** DELETE is never O(table), and no rewrite retires unverified bytes.
  *
  * Contract pinned here: a predicate the manifest's bounds + null
  * counts classify all-or-nothing for EVERY head file executes
  * METADATA-ONLY (one manifest publish, zero data files read or
  * written — the Iceberg metadata-delete model); anything else routes
  * to the group-based row-level rewrite, which prunes to the files
  * that might hold matches and rewrites ONLY those. Either way an
  * untouched file is never rewritten — at 100 TB a `DELETE WHERE day <
  * cutoff` on a day-clustered table is a metadata edit, not a table
  * rewrite. And the row-level rewrite obeys the round-14 integrity
  * law: it re-hashes every file it retires against the manifest
  * checksum first, refusing to launder silent corruption into fresh
  * (honest-looking) checksums.
  */
class MetadataDeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = tmpDir("graft_metadelete")
    spark.conf.set("spark.sql.catalog.gmd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmd.root", r)
    r
  }

  /** Three one-file appends with disjoint k bands ([1,10], [11,20],
    * [21,30]) — every band edge classifiable from manifest bounds.
    */
  private def seed3(ns: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS gmd.$ns")
    spark.sql(s"CREATE TABLE gmd.$ns.t (k BIGINT, s STRING)")
    val dir = s"$root/$ns/t"
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { band =>
      band.map(k => (k, s"v$k")).toDF("k", "s").coalesce(1)
        .write.format("graftsink").mode("append").save(dir)
    }
    val m = GraftSink.latestManifest(spark, dir).get
    assert(m.files.size == 3, s"seed wants one file per band: $m")
    dir
  }

  private def fileOfBand(dir: String, lo: Long): GraftSink.ManifestFile =
    GraftSink.latestManifest(spark, dir).get.files
      .find(_.bounds("k")._1 == lo).get

  test("a bounds-provable DELETE is metadata-only: zero data-file " +
      "opens, no new data files, the data dir untouched, prior " +
      "version still time-travels to the rows") {
    root
    val dir = seed3("meta")
    val before = GraftSink.latestManifest(spark, dir).get
    val doomedName = fileOfBand(dir, 1L).name
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataBefore = fs.listStatus(new Path(dir, "data"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    val readers = GraftSink.readersCreated.get()
    spark.sql("DELETE FROM gmd.meta.t WHERE k <= 10")
    assert(GraftSink.readersCreated.get() === readers,
      "a metadata-only DELETE must open ZERO data files")
    val after = GraftSink.latestManifest(spark, dir).get
    assert(after.version === before.version + 1)
    assert(after.files.map(_.name).toSet ===
      before.files.map(_.name).toSet - doomedName,
      "exactly the all-match file drops; the others CARRY by name " +
        "(a carried name is proof the file was never rewritten)")
    val dataAfter = fs.listStatus(new Path(dir, "data"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    assert(dataAfter === dataBefore,
      "no data file written, none deleted — the dropped file stays " +
        "for time travel until vacuum")
    assert(spark.sql("SELECT k FROM gmd.meta.t ORDER BY k")
      .as[Long].collect().toSeq === (11L to 30L),
      "the delete is exact")
    assert(spark.sql(
      s"SELECT count(*) FROM gmd.meta.t VERSION AS OF ${before.version}")
      .as[Long].head() === 30L, "pre-delete rows one VERSION AS OF away")
  }

  test("a provably-no-op DELETE publishes NOTHING: no version bump, " +
      "zero file opens") {
    root
    val dir = seed3("noop")
    val before = GraftSink.latestVersion(spark, dir).get
    val readers = GraftSink.readersCreated.get()
    spark.sql("DELETE FROM gmd.noop.t WHERE k > 1000")
    assert(GraftSink.readersCreated.get() === readers)
    assert(GraftSink.latestVersion(spark, dir).get === before,
      "nothing matched, nothing published")
  }

  test("a straddling DELETE routes group-based and rewrites ONLY " +
      "files that might match; provably-clear files carry by name") {
    root
    val dir = seed3("strad")
    val before = GraftSink.latestManifest(spark, dir).get
    val clearName = fileOfBand(dir, 21L).name
    // k <= 15 straddles the [11,20] file -> not metadata-provable
    spark.sql("DELETE FROM gmd.strad.t WHERE k <= 15")
    val after = GraftSink.latestManifest(spark, dir).get
    assert(after.version === before.version + 1)
    assert(after.files.map(_.name).contains(clearName),
      "the [21,30] file provably holds no match — it must CARRY, " +
        "never rewrite")
    assert(after.files.map(_.name).toSet.intersect(
      before.files.map(_.name).toSet) === Set(clearName),
      "both files that might match were scanned and replaced; the " +
        "clear file alone carries")
    assert(spark.sql("SELECT k FROM gmd.strad.t ORDER BY k")
      .as[Long].collect().toSeq === (16L to 30L))
  }

  test("a row-level rewrite REFUSES to retire a file whose bytes no " +
      "longer match the manifest checksum — corruption cannot be " +
      "laundered through UPDATE/MERGE/DELETE") {
    root
    val dir = seed3("laund")
    val victim = fileOfBand(dir, 1L)
    val before = GraftSink.latestVersion(spark, dir).get
    // same-size damage: flip one bit mid-file (the FsckSpec shape)
    val p = new Path(dir, s"data/${victim.name}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    buf(len.toInt / 2) = (buf(len.toInt / 2) ^ 0x01).toByte
    val out = fs.create(p, true)
    try out.write(buf) finally out.close()
    val ex = intercept[Exception] {
      spark.sql("UPDATE gmd.laund.t SET s = 'X' WHERE k <= 10")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("refusing to launder")),
      s"the retire-time re-hash must refuse, naming the law: " +
        s"${messages(ex)}")
    assert(GraftSink.latestVersion(spark, dir).get === before,
      "the refused rewrite must publish nothing")
    // the damage stays VISIBLE to the integrity drill, not blessed
    val deep = GraftSink.fsck(spark, dir, deep = true)
    assert(deep.checksumMismatches.exists(_.startsWith(victim.name)),
      s"deep fsck still names the flipped file: $deep")
  }

  test("a LIKE-prefix DELETE is metadata-only when the prefix band " +
      "covers whole files (truncation-sound both directions)") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmd.pfx")
    spark.sql("CREATE TABLE gmd.pfx.t (k BIGINT, s STRING)")
    val dir = s"$root/pfx/t"
    (1L to 10L).map(k => (k, s"alpha$k")).toDF("k", "s").coalesce(1)
      .write.format("graftsink").mode("append").save(dir)
    (11L to 20L).map(k => (k, s"beta$k")).toDF("k", "s").coalesce(1)
      .write.format("graftsink").mode("append").save(dir)
    val before = GraftSink.latestManifest(spark, dir).get
    assert(before.files.size == 2)
    val readers = GraftSink.readersCreated.get()
    spark.sql("DELETE FROM gmd.pfx.t WHERE s LIKE 'alpha%'")
    assert(GraftSink.readersCreated.get() === readers,
      "the prefix band covers one whole file and excludes the other " +
        "— metadata-only, zero data-file opens")
    val after = GraftSink.latestManifest(spark, dir).get
    assert(after.version === before.version + 1 &&
      after.files.size == 1)
    assert(spark.sql("SELECT k FROM gmd.pfx.t ORDER BY k")
      .as[Long].collect().toSeq === (11L to 20L))
  }

  test("a streaming tail crosses a metadata-delete version cleanly: " +
      "no re-emit, no crash, later appends still arrive exactly once") {
    root
    val dir = seed3("tail")
    val name = "md_tail_sink"
    val q = spark.readStream.format("graftsink")
      .option("startingVersion", 0).load(dir)
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 30L)
      spark.sql("DELETE FROM gmd.tail.t WHERE k <= 10") // metadata-only
      q.processAllAvailable()
      assert(spark.table(name).count() === 30L,
        "a version that adds no files emits nothing — carried files " +
          "must not re-emit")
      (31L to 35L).map(k => (k, s"v$k")).toDF("k", "s").coalesce(1)
        .write.format("graftsink").mode("append").save(dir)
      q.processAllAvailable()
      assert(spark.table(name).select("k").as[Long].collect().toSet
        === (1L to 35L).toSet,
        "appends after the delete version arrive exactly once")
    } finally q.stop()
  }

  test("vacuum reclaims a metadata-deleted file once no surviving " +
      "version references it; survivors, reads, and fsck stay intact") {
    root
    val dir = seed3("vac")
    val doomedName = fileOfBand(dir, 1L).name
    spark.sql("DELETE FROM gmd.vac.t WHERE k <= 10")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(dir, s"data/$doomedName")),
      "until vacuum, prior versions still reference the dropped file")
    GraftSink.vacuum(spark, dir, keepVersions = 1, graceMs = 0L)
    assert(!fs.exists(new Path(dir, s"data/$doomedName")),
      "with the pre-delete versions expired, the dropped file is " +
        "physically reclaimed")
    assert(spark.sql("SELECT k FROM gmd.vac.t ORDER BY k")
      .as[Long].collect().toSeq === (11L to 30L))
    val r = GraftSink.fsck(spark, dir, deep = true)
    assert(r.deepVerified, s"post-vacuum integrity: $r")
  }

  test("plan-time stats memo is incarnation-aware: DROP + re-create " +
      "at the same path serves the NEW table's stats, not the dead " +
      "incarnation's") {
    val dir = tmpDir("gmd_statsmemo")
    Seq(1L, 2L, 3L).map(k => (k, "a")).toDF("k", "s").coalesce(1)
      .write.format("graftsink").mode("overwrite").save(dir)
    val m1 = GraftSink.latestManifest(spark, dir).get
    val (ndv1, _) = GraftSink.versionColumnStats(dir, m1)
    assert(ndv1("k")._1 === 3L && ndv1("k")._2,
      s"sparse NDV is exact: $ndv1")
    // same path, same version number, different data — the memo key
    // must not alias across incarnations
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    Thread.sleep(5) // distinct commit stamp (ms granularity)
    (1L to 7L).map(k => (k, "b")).toDF("k", "s").coalesce(1)
      .write.format("graftsink").mode("overwrite").save(dir)
    val m2 = GraftSink.latestManifest(spark, dir).get
    assert(m2.version === m1.version, "the aliasing shape: same version")
    val (ndv2, _) = GraftSink.versionColumnStats(dir, m2)
    assert(ndv2("k")._1 === 7L && ndv2("k")._2,
      s"the new incarnation's stats, never the dead table's: $ndv2")
  }
}
