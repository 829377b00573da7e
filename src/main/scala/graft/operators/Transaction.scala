package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table atomic publish — the cross-table half of
  * [[Ops.snapshotWrite]]'s single-table versioning, the Iceberg-lite
  * commit protocol every warehouse needs once two tables must move
  * together (facts + their dimension, a table + its index, orders +
  * lineitem): readers either see ALL tables at transaction N or all at
  * N−1, never a torn mix.
  *
  * Layout:
  * {{{
  * root/<table>/t<txId>/...parquet     data, immutable once committed
  * root/_commits/tx<txId>.json         manifest: table -> txId written
  * }}}
  *
  * The ONLY atomic primitive used is single-path filesystem rename, on
  * the manifest file: data dirs stage under `__staging_*` and rename
  * into place FIRST (invisible to readers — readers resolve paths only
  * through committed manifests), then the manifest itself stages and
  * renames into `_commits/` — that rename IS the commit point. A crash
  * anywhere before it leaves orphan `t<txId>` dirs that no manifest
  * references; the next publish at the same txId deletes and re-stages
  * them (they are uncommitted by construction — their txId is absent
  * from `_commits`).
  *
  * Unchanged tables are NOT rewritten: the new manifest carries the
  * previous table→version entries forward, so a 100-table warehouse
  * publishing one changed table pays one table write + one tiny
  * manifest, and time travel ([[read]] with `tx`) still resolves every
  * table of the historical snapshot. Single-committer semantics, like
  * every staged swap in [[ParquetIO]] — a real deployment puts a lock
  * (or a CAS-capable store) under `_commits/`.
  */
object Transaction {

  /** Test seam: runs immediately before the manifest rename — the
    * commit point — with every data dir already staged. A spec can
    * crash a publish HERE to prove a torn (data-landed, manifest-less)
    * publish is invisible: readers resolve only committed manifests,
    * so state and data can never disagree. No-op in production.
    */
  private[graft] var commitBarrier: () => Unit = () => ()

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(root: String) = new Path(root, "_commits")

  /** Committed transaction ids, ascending; empty before first publish. */
  def committedTxs(spark: SparkSession, root: String): Seq[Long] = {
    val dir = commitsDir(root)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("tx") && n.endsWith(".json") =>
        n.stripPrefix("tx").stripSuffix(".json").toLong }
      .sorted
  }

  /** The table→version map of transaction `tx`. */
  def manifest(spark: SparkSession, root: String,
      tx: Long): Map[String, Long] = {
    val p = new Path(commitsDir(root), s"tx$tx.json")
    val fs = fsOf(spark, p)
    require(fs.exists(p), s"transaction $tx not committed under $root")
    val in = fs.open(p)
    val bytes =
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        out.toByteArray
      } finally in.close()
    val s = new String(bytes, StandardCharsets.UTF_8)
    "\"([^\"]+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  /** Atomically publish `tables` as one transaction; any table NOT in
    * the map carries forward from the previous transaction. Returns
    * the committed txId.
    */
  def publish(spark: SparkSession, root: String,
      tables: Map[String, DataFrame]): Long = {
    require(tables.nonEmpty, "publish: no tables")
    val committed = committedTxs(spark, root)
    val txId = committed.lastOption.fold(0L)(_ + 1)
    val prev = committed.lastOption
      .map(manifest(spark, root, _)).getOrElse(Map.empty[String, Long])
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    // data first, invisible until the manifest commits
    tables.foreach { case (name, df) =>
      val dest = new Path(new Path(rootP, name), s"t$txId")
      // leftover from a crashed publish at this txId is uncommitted by
      // construction (txId is not in _commits) — safe to drop
      if (fs.exists(dest)) fs.delete(dest, true)
      val tmp = new Path(rootP,
        "__staging_" + java.util.UUID.randomUUID().toString.take(8))
      try df.write.mode("overwrite").parquet(tmp.toString)
      catch { case e: Throwable => fs.delete(tmp, true); throw e }
      fs.mkdirs(dest.getParent)
      if (!fs.rename(tmp, dest)) {
        fs.delete(tmp, true)
        throw new java.io.IOException(
          s"publish: rename $tmp -> $dest failed")
      }
    }
    // commit point: one manifest rename
    val entries = prev ++ tables.keys.map(_ -> txId)
    val json = entries.toSeq.sortBy(_._1)
      .map { case (t, v) => s"${graft.Json.quote(t)}: $v" }
      .mkString("{", ", ", "}")
    val dir = commitsDir(root)
    fs.mkdirs(dir)
    val mTmp = new Path(dir,
      "__staging_" + java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(mTmp, false)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    commitBarrier()
    val mDest = new Path(dir, s"tx$txId.json")
    if (!fs.rename(mTmp, mDest)) {
      fs.delete(mTmp, false)
      throw new java.io.IOException(
        s"publish: commit rename $mTmp -> $mDest failed " +
          "(concurrent committer?)")
    }
    txId
  }

  /** Read `table` at transaction `tx` (latest committed when None) —
    * always through a committed manifest, so concurrent publishes and
    * torn crashes are invisible.
    */
  def read(spark: SparkSession, root: String, table: String,
      tx: Option[Long] = None): DataFrame = {
    val committed = committedTxs(spark, root)
    require(committed.nonEmpty, s"no committed transactions under $root")
    val id = tx.getOrElse(committed.last)
    val m = manifest(spark, root, id)
    require(m.contains(table),
      s"table '$table' not in transaction $id (${m.keys.mkString(", ")})")
    spark.read.parquet(s"$root/$table/t${m(table)}")
  }

  /** Test seam: runs immediately before [[syncTo]]'s manifest rename —
    * the replica's commit point — with every member table's version
    * dirs already copied. The race spec holds a sync open HERE while a
    * replica reader proves it still resolves only the PREVIOUS
    * transaction's pairs. No-op in production.
    */
  private[graft] var syncBarrier: () => Unit = () => ()

  /** TRANSACTION-CONSISTENT REPLICATION — sync a whole transaction to
    * a DR replica root as ONE atomic step. Per-table replication of a
    * multi-table commit re-creates exactly the torn state the
    * transaction layer exists to prevent: a replica serving facts
    * from tx2 beside a summary from tx1. Here every member table's
    * pinned version dir copies FIRST (distributed, one task per file;
    * dirs stage and rename whole, so a crash mid-copy never leaves a
    * half dir that a retry would skip as present), and the
    * transaction manifest publishes LAST as the single commit point —
    * a replica reader resolves only committed manifests, so it sees
    * all tables at tx N or all at the previous sync, never a blend.
    *
    * Incremental by construction: a version dir the replica already
    * holds is a COMMITTED whole (rename-atomic), so it never
    * re-copies — syncing tx N after tx N−1 copies only the tables
    * tx N actually rewrote (carry-forward entries are already
    * there). Re-syncing an already-synced tx is a no-op. Returns the
    * number of (table, version) dirs copied.
    */
  def syncTo(spark: SparkSession, srcRoot: String, dstRoot: String,
      tx: Option[Long] = None): Int = {
    val committed = committedTxs(spark, srcRoot)
    require(committed.nonEmpty, s"no committed transactions under $srcRoot")
    val id = tx.getOrElse(committed.last)
    require(committed.contains(id),
      s"transaction $id not committed under $srcRoot")
    val m = manifest(spark, srcRoot, id)
    val dstP = new Path(dstRoot)
    val fs = fsOf(spark, dstP)
    fs.mkdirs(dstP)
    val already = new Path(commitsDir(dstRoot), s"tx$id.json")
    if (fs.exists(already)) { // idempotent re-sync: data settled —
      carryRefs(spark, srcRoot, dstRoot) // but a re-point still carries
      return 0
    }
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // (table, version) dirs the replica lacks — each stages under a
    // sync-scoped dir, files fan out cluster-wide, then ONE rename
    // per dir makes it whole-or-absent
    val needed = m.toSeq.sortBy(_._1).filter { case (t, v) =>
      !fs.exists(new Path(dstRoot, s"$t/t$v")) }
    if (needed.nonEmpty) {
      val stagingRoot = new Path(dstRoot,
        "__staging_sync_" + java.util.UUID.randomUUID().toString.take(8))
      val files: Seq[(String, String)] = needed.flatMap { case (t, v) =>
        val from = new Path(srcRoot, s"$t/t$v")
        val sfs = fsOf(spark, from)
        sfs.listStatus(from).filter(_.isFile).map(st =>
          (st.getPath.toString,
            new Path(stagingRoot, s"$t/t$v/${st.getPath.getName}")
              .toString))
      }
      val slices = math.min(files.size,
        math.max(64, spark.sparkContext.defaultParallelism * 2)).max(1)
      spark.sparkContext.parallelize(files, slices)
        .foreach { case (from, to) =>
          val f = new Path(from)
          val d = new Path(to)
          org.apache.hadoop.fs.FileUtil.copy(
            f.getFileSystem(conf.value), f,
            d.getFileSystem(conf.value), d, false, true, conf.value)
          ()
        }
      needed.foreach { case (t, v) =>
        val dest = new Path(dstRoot, s"$t/t$v")
        fs.mkdirs(dest.getParent)
        if (!fs.rename(new Path(stagingRoot, s"$t/t$v"), dest) &&
            !fs.exists(dest)) {
          // a racing sync of the same/later tx placing the SAME
          // immutable (table, version) content loses the rename
          // benignly — only a rename that leaves the dest ABSENT is
          // a real failure
          fs.delete(stagingRoot, true)
          throw new java.io.IOException(
            s"syncTo: rename of $t/t$v into $dstRoot failed")
        }
      }
      fs.delete(stagingRoot, true)
    }
    // commit point: the tx manifest lands LAST, atomically — the same
    // staged-rename discipline as publish()
    val dir = commitsDir(dstRoot)
    fs.mkdirs(dir)
    val mTmp = new Path(dir,
      "__staging_" + java.util.UUID.randomUUID().toString.take(8))
    val srcManifest = new Path(commitsDir(srcRoot), s"tx$id.json")
    val sfs = fsOf(spark, srcManifest)
    val in = sfs.open(srcManifest)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      out.toByteArray
    } finally in.close()
    val out = fs.create(mTmp, false)
    try out.write(bytes) finally out.close()
    syncBarrier()
    if (!fs.rename(mTmp, already)) {
      fs.delete(mTmp, false)
      // two syncs of the same tx write byte-identical manifests, so
      // losing the commit rename to a racer is success, not conflict
      if (!fs.exists(already))
        throw new java.io.IOException(
          s"syncTo: commit rename to $already failed")
    }
    carryRefs(spark, srcRoot, dstRoot)
    needed.size
  }

  /** Replicate source REFS (the vacuum-exempt GC roots) onto the
    * replica — the same contract as graftsink's tag carry-over:
    * without it a REPLICA [[vacuum]] can drop a transaction the
    * source still pins, silently breaking "the corpus run X trained
    * on stays reproducible at the DR site". txIds ARE comparable
    * across the two roots (syncTo copies manifests verbatim), so a
    * ref carries whenever the replica has that tx committed; a ref
    * pinning a tx the replica never synced is skipped (it cannot pin
    * what it does not hold). Re-points follow the source (tag() is
    * an atomic rename); carry failures warn loudly naming the ref.
    */
  private def carryRefs(spark: SparkSession, srcRoot: String,
      dstRoot: String): Unit = {
    val srcRefDir = refsDir(srcRoot)
    val sfs = fsOf(spark, srcRefDir)
    if (!sfs.exists(srcRefDir)) return
    val dstTxs = committedTxs(spark, dstRoot).toSet
    sfs.listStatus(srcRefDir).map(_.getPath.getName)
      .filterNot(_.startsWith("__")).foreach { name =>
        try {
          val tx = refTx(spark, srcRoot, name)
          if (dstTxs(tx) &&
              (try refTx(spark, dstRoot, name) != tx
              catch { case _: IllegalArgumentException => true }))
            tag(spark, dstRoot, name, tx)
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"transaction: ref '$name' could not be " +
            s"carried to $dstRoot (${e.getMessage}) — the replica is " +
            "missing this GC root until a later sync re-carries it")
        }
      }
  }

  private def refsDir(root: String) = new Path(root, "_refs")

  /** Pin a human name to a committed transaction (Iceberg "tag"): the
    * release a model trained on, the audited month-end, the state a
    * backfill should reproduce. A ref is one tiny file whose content
    * is the txId; re-tagging moves the name atomically (staged write +
    * rename). Refs also act as GC roots for [[vacuum]].
    */
  def tag(spark: SparkSession, root: String, name: String,
      tx: Long): Unit = {
    require(name.nonEmpty && !name.contains('/') && !name.startsWith("__"),
      s"bad ref name '$name'")
    require(committedTxs(spark, root).contains(tx),
      s"cannot tag uncommitted transaction $tx")
    val dir = refsDir(root)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val tmp = new Path(dir,
      "__staging_" + java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, false)
    try out.write(tx.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(dir, name)
    fs.delete(dest, false) // re-tag: move the name
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"tag: rename to $dest failed")
    }
  }

  /** Resolve a ref name to its txId. */
  def refTx(spark: SparkSession, root: String, name: String): Long = {
    val p = new Path(refsDir(root), name)
    val fs = fsOf(spark, p)
    require(fs.exists(p), s"no ref '$name' under $root")
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      new String(out.toByteArray, StandardCharsets.UTF_8).trim.toLong
    } finally in.close()
  }

  /** Read `table` as of the tagged transaction. */
  def readRef(spark: SparkSession, root: String, table: String,
      name: String): DataFrame =
    read(spark, root, table, Some(refTx(spark, root, name)))

  /** Drop history: keep the newest `keep` transactions plus everything
    * a ref pins, delete the manifests of the rest, and remove every
    * table-version dir no surviving manifest references. Returns the
    * dropped txIds. The reachability walk is the law that makes this
    * safe: a version dir carried forward by a NEWER kept manifest
    * survives even when the transaction that wrote it is dropped.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "vacuum: keep must be >= 1")
    val committed = committedTxs(spark, root)
    val refDir = refsDir(root)
    val fs = fsOf(spark, refDir)
    val pinned: Set[Long] =
      if (!fs.exists(refDir)) Set.empty
      else fs.listStatus(refDir).map(_.getPath.getName).toSeq
        .filterNot(_.startsWith("__"))
        .map(refTx(spark, root, _)).toSet
    val keptTxs = (committed.takeRight(keep).toSet ++ pinned).toSeq.sorted
    val dropTxs = committed.filterNot(keptTxs.contains)
    if (dropTxs.isEmpty) return Seq.empty
    // reachable (table, version) pairs under the kept manifests
    val live: Set[(String, Long)] = keptTxs
      .flatMap(tx => manifest(spark, root, tx).toSeq).toSet
    dropTxs.foreach { tx =>
      fs.delete(new Path(commitsDir(root), s"tx$tx.json"), false)
    }
    val rootP = new Path(root)
    fs.listStatus(rootP).filter(s => s.isDirectory &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("__")).foreach { t =>
      val table = t.getPath.getName
      fs.listStatus(t.getPath).filter(_.isDirectory).foreach { v =>
        val name = v.getPath.getName
        if (name.startsWith("t") && name.drop(1).forall(_.isDigit) &&
            !live.contains((table, name.drop(1).toLong)))
          fs.delete(v.getPath, true)
      }
    }
    dropTxs
  }
}
