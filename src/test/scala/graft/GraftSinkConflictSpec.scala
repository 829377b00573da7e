package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.sources.GraftSink

/** The commit protocol's CONFLICT semantics under concurrent rewrites
  * — the hazards a pure append race never exercises:
  *
  *  1. compact()/cluster() racing a row-level rewrite: the maintenance
  *     op merged a file's PRE-rewrite bytes; publishing them would
  *     resurrect deleted rows. It must detect the vanished source file,
  *     drop its stale output, and recompute from a fresh snapshot.
  *  2. a row-level rewrite racing compaction (the mirror image): the
  *     DML scanned a file compaction has since merged away; carrying
  *     the compacted replacement alongside the DML's rewritten rows
  *     would duplicate them. The DML loses loudly
  *     (ConcurrentRewriteException — Delta's conflict discipline).
  *  3. streaming epoch replay when OTHER commits landed between the
  *     epoch's publish and the crash: the replayed id sits below the
  *     head, so a head-only guard would re-publish (duplicate rows).
  *     The restart-time guard walks history to this WRITER's frontier.
  *
  * Interleavings are made DETERMINISTIC via GraftSink.maintenanceBarrier
  * (a test seam between the maintenance op's snapshot read and its
  * publish) and direct private[graft] publish calls — no thread races.
  */
class GraftSinkConflictSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir = tmpDir("graft_conflict") + "/t"
  private def conf = new SerializableConfiguration(
    spark.sparkContext.hadoopConfiguration)

  /** Seed n single-file appends of one row each: k = 0..n-1. */
  private def seed(dir: String, n: Int): Unit =
    (0 until n).foreach { i =>
      Seq((i.toLong, s"row$i")).toDF("k", "s").coalesce(1)
        .write.format("graftsink").mode("append").save(dir)
    }

  /** Whole-file delete of the file holding key k, as a legitimate
    * row-level rewrite commit (replace the file, publish no rows).
    */
  private def deleteFileHolding(dir: String, k: Long): String = {
    val m = GraftSink.latestManifest(spark, dir).get
    val victim = m.files.find(_.bounds.get("k")
      .exists { case (lo, hi) => lo == k && hi == k })
      .getOrElse(sys.error(s"no single-key file for k=$k")).name
    GraftSink.publish(spark, conf, dir, m.schemaDdl, Seq.empty,
      truncate = false, replace = Some(Set(victim)))
    victim
  }

  test("compact() racing a row-level delete: stale merged output is " +
    "dropped and recomputed — deleted rows never resurrect") {
    val dir = freshDir
    seed(dir, 6)
    val before = GraftSink.rewriteConflicts.get()
    // one-shot barrier: the delete lands AFTER compact's snapshot
    // read and merge, BEFORE its publish — the exact advisory window
    var fired = false
    GraftSink.maintenanceBarrier = () => {
      if (!fired) { fired = true; deleteFileHolding(dir, 3L) }
    }
    try GraftSink.compact(spark, dir, smallBytes = 1L << 20)
    finally GraftSink.maintenanceBarrier = () => ()
    assert(fired, "barrier must have run inside compact()")
    assert(GraftSink.rewriteConflicts.get() === before + 1,
      "the vanished group member must be detected as a conflict")
    val got = spark.read.format("graftsink").load(dir)
      .select("k").as[Long].collect().sorted
    assert(got === Seq(0L, 1L, 2L, 4L, 5L),
      s"deleted row resurrected or live row lost: ${got.mkString(",")}")
    // the recompute still compacted: survivors live in fewer files
    val files = GraftSink.latestManifest(spark, dir).get.files
    assert(files.size < 5, s"recomputed compaction must merge: $files")
    // no orphaned stale merged file remains listed anywhere live
    assert(files.map(_.rows).sum === 5)
  }

  test("cluster() racing a row-level delete: same conflict gate") {
    val dir = freshDir
    seed(dir, 6)
    val before = GraftSink.rewriteConflicts.get()
    var fired = false
    GraftSink.maintenanceBarrier = () => {
      if (!fired) { fired = true; deleteFileHolding(dir, 2L) }
    }
    try GraftSink.cluster(spark, dir, Seq("k"))
    finally GraftSink.maintenanceBarrier = () => ()
    assert(fired)
    assert(GraftSink.rewriteConflicts.get() === before + 1)
    val got = spark.read.format("graftsink").load(dir)
      .select("k").as[Long].collect().sorted
    assert(got === Seq(0L, 1L, 3L, 4L, 5L))
  }

  test("a row-level rewrite whose scanned file was compacted away " +
    "fails loudly instead of duplicating rows") {
    val dir = freshDir
    seed(dir, 4)
    val m = GraftSink.latestManifest(spark, dir).get
    val scanned = m.files.head.name
    // compaction replaces every small file, including `scanned`
    GraftSink.compact(spark, dir, smallBytes = 1L << 20)
    val e = intercept[GraftSink.ConcurrentRewriteException] {
      GraftSink.publish(spark, conf, dir, m.schemaDdl, Seq.empty,
        truncate = false, replace = Some(Set(scanned)))
    }
    assert(e.getMessage.contains(scanned))
    // the loser changed nothing
    assert(spark.read.format("graftsink").load(dir).count() === 4)
  }

  test("epoch replay after interleaved commits: the restart scan " +
    "finds the epoch below the head and publishes nothing") {
    val dir = freshDir
    val ddl = "k BIGINT,s STRING"
    // stream q1 publishes epoch 5 (v0)
    GraftSink.publish(spark, conf, dir, ddl, Seq.empty,
      truncate = false, epoch = Some(5L), epochWriter = Some("q1"),
      replayScan = true)
    // two interleaved non-stream commits bury it: a batch append (v1)
    // and a schema-carrying empty commit (v2)
    Seq((1L, "a")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)
    GraftSink.publish(spark, conf, dir, ddl, Seq.empty, truncate = false)
    assert(GraftSink.latestVersion(spark, dir) === Some(2))
    // crash-recovery replay of epoch 5 (fresh StreamingWrite instance
    // ⇒ replayScan): must find its id two versions down and no-op
    GraftSink.publish(spark, conf, dir, ddl, Seq.empty,
      truncate = false, epoch = Some(5L), epochWriter = Some("q1"),
      replayScan = true)
    assert(GraftSink.latestVersion(spark, dir) === Some(2),
      "replayed epoch must not publish a new version")
    // head-only guard (steady state) would also have been WRONG here:
    // epoch 6 from the same writer proceeds normally
    GraftSink.publish(spark, conf, dir, ddl, Seq.empty,
      truncate = false, epoch = Some(6L), epochWriter = Some("q1"))
    assert(GraftSink.latestVersion(spark, dir) === Some(3))
  }

  test("epoch ids are writer-scoped: stream q2's epoch 5 is not " +
    "deduped against q1's, and legacy stamps match any writer") {
    val dir = freshDir
    val ddl = "k BIGINT"
    GraftSink.publish(spark, conf, dir, ddl, Seq.empty,
      truncate = false, epoch = Some(5L), epochWriter = Some("q1"))
    // a DIFFERENT stream at the same epoch id must still publish
    GraftSink.publish(spark, conf, dir, ddl, Seq.empty,
      truncate = false, epoch = Some(5L), epochWriter = Some("q2"),
      replayScan = true)
    assert(GraftSink.latestVersion(spark, dir) === Some(1),
      "writer-scoped epochs must not cross-dedupe")
    // legacy stamp (no writer recorded): a replay matches on id alone
    GraftSink.publish(spark, conf, dir, ddl, Seq.empty,
      truncate = false, epoch = Some(9L), epochWriter = None)
    GraftSink.publish(spark, conf, dir, ddl, Seq.empty,
      truncate = false, epoch = Some(9L), epochWriter = Some("q3"),
      replayScan = true)
    assert(GraftSink.latestVersion(spark, dir) === Some(2),
      "legacy writer-less epoch must dedupe a replay of the same id")
  }

  test("NaN-bearing double files record [finite lo, NaN] bounds — " +
    "skipping, pushed MIN/MAX, and COUNT(col) all stay sound") {
    val dir = freshDir
    // file 0: finite only; file 1: LEADING NaN (the freeze-at-
    // [NaN,NaN] shape under naive comparison tracking); file 2:
    // trailing NaN (the finite-hi-below-NaN shape); file 3: all NaN
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1)
      .write.format("graftsink").mode("append").save(dir)
    Seq((3L, Double.NaN), (4L, 5.0)).toDF("k", "v").coalesce(1)
      .write.format("graftsink").mode("append").save(dir)
    Seq((5L, 7.0), (6L, Double.NaN)).toDF("k", "v").coalesce(1)
      .write.format("graftsink").mode("append").save(dir)
    Seq((7L, Double.NaN)).toDF("k", "v").coalesce(1)
      .write.format("graftsink").mode("append").save(dir)
    val m = GraftSink.latestManifest(spark, dir).get
    def vb(k: Long) = m.files
      .find(_.bounds.get("k").exists(_._1 == k)).get.bounds("v")
    assert(vb(1L) === ((1.0, 2.0)))
    assert(vb(3L)._1 === 5.0)
    assert(vb(3L)._2.asInstanceOf[Double].isNaN,
      "a NaN in the file must surface as hi = NaN (Spark's max)")
    assert(vb(5L)._1 === 7.0)
    assert(vb(5L)._2.asInstanceOf[Double].isNaN)
    assert(vb(7L)._1.asInstanceOf[Double].isNaN, "all-NaN file: lo=NaN")
    // equality probe inside a NaN file's finite range: found (file 1
    // not pruned); file 2 (lo=7) and file 0 (hi=2) are skippable
    val eq = spark.read.format("graftsink").load(dir)
      .filter($"v" === 5.0).select("k").as[Long].collect()
    assert(eq.toSeq === Seq(4L))
    // `v > 6.0`: Spark orders NaN above all doubles, so all three NaN
    // rows qualify along with 7.0 — a finite recorded hi on files 1-3
    // would have silently dropped k=3/6/7
    val gt = spark.read.format("graftsink").load(dir)
      .filter($"v" > 6.0).select("k").as[Long].collect().sorted
    assert(gt.toSeq === Seq(3L, 5L, 6L, 7L))
    // metadata-served MIN/MAX stay ANSWERABLE and CORRECT: min folds
    // finite los (all-NaN file contributes nothing), max is NaN — the
    // exact values Spark's aggregate over the data returns
    val before = GraftSink.readersCreated.get()
    val r = spark.read.format("graftsink").load(dir)
      .agg(min($"v"), max($"v")).as[(Double, Double)].head()
    assert(GraftSink.readersCreated.get() === before,
      "MIN/MAX over NaN-aware bounds still answer from the manifest")
    assert(r._1 === 1.0 && r._2.isNaN)
    // COUNT(v): NaN is non-null — all 7 rows count, zero files opened
    val b2 = GraftSink.readersCreated.get()
    val cnt = spark.read.format("graftsink").load(dir)
      .agg(count($"v")).as[Long].head()
    assert(cnt === 7L && GraftSink.readersCreated.get() === b2)
  }
}
