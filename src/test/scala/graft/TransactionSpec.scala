package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Transaction

/** Laws of the multi-table atomic publish: manifest-resolved reads,
  * carry-forward of unchanged tables, torn-publish invisibility, and
  * crash-leftover recovery.
  */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = tmpDir("graft_txspec")

  test("publish/read round trip; unchanged table carries forward") {
    val root = freshRoot()
    val a0 = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b0 = Seq((1, 10), (2, 20)).toDF("k", "n")
    assert(Transaction.publish(spark, root, Map("a" -> a0, "b" -> b0)) == 0L)
    val a1 = Seq((1, "x2"), (2, "y2")).toDF("k", "v")
    assert(Transaction.publish(spark, root, Map("a" -> a1)) == 1L)
    // tx1 manifest: a rewritten at 1, b carried forward at 0
    assert(Transaction.manifest(spark, root, 1L) ==
      Map("a" -> 1L, "b" -> 0L))
    // latest read pairs new a with carried b
    val got = Transaction.read(spark, root, "a")
      .join(Transaction.read(spark, root, "b"), "k")
      .orderBy("k").as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((1, "x2", 10), (2, "y2", 20)))
    // time travel to tx0 sees the original pair
    val old = Transaction.read(spark, root, "a", Some(0L))
      .orderBy("k").as[(Int, String)].collect().toSeq
    assert(old == Seq((1, "x"), (2, "y")))
  }

  test("torn publish (data staged, no manifest) is invisible; the next " +
      "publish recovers the leftover and commits") {
    val root = freshRoot()
    val a0 = Seq((1, 100)).toDF("k", "n")
    Transaction.publish(spark, root, Map("a" -> a0))
    // simulate a crash: tx1 data lands but the commit rename never ran
    Seq((1, 999)).toDF("k", "n")
      .write.parquet(s"$root/a/t1")
    // readers still resolve through the last committed manifest
    assert(Transaction.committedTxs(spark, root) == Seq(0L))
    assert(Transaction.read(spark, root, "a")
      .as[(Int, Int)].collect().toSeq == Seq((1, 100)))
    // a retried publish at the same txId replaces the orphan and commits
    val tx = Transaction.publish(spark, root,
      Map("a" -> Seq((1, 200)).toDF("k", "n")))
    assert(tx == 1L)
    assert(Transaction.read(spark, root, "a")
      .as[(Int, Int)].collect().toSeq == Seq((1, 200)))
  }

  test("cross-table consistency: every committed tx satisfies the " +
      "invariant even when tables change together") {
    val root = freshRoot()
    // invariant: sum(b.n) == count(a) * 10 in every transaction
    Transaction.publish(spark, root, Map(
      "a" -> Seq(1, 2).toDF("k"),
      "b" -> Seq((1, 10), (2, 10)).toDF("k", "n")))
    Transaction.publish(spark, root, Map(
      "a" -> Seq(1, 2, 3).toDF("k"),
      "b" -> Seq((1, 10), (2, 10), (3, 10)).toDF("k", "n")))
    for (tx <- Transaction.committedTxs(spark, root)) {
      val nA = Transaction.read(spark, root, "a", Some(tx)).count()
      val sumB = Transaction.read(spark, root, "b", Some(tx))
        .agg(sum("n")).as[Long].head()
      assert(sumB == nA * 10, s"tx $tx torn: count(a)=$nA sum(b)=$sumB")
    }
  }

  test("tags pin transactions; vacuum keeps refs and carried-forward " +
      "versions reachable, drops the rest") {
    val root = freshRoot()
    // tx0: a+b; tx1: only a changes (b carries forward at version 0);
    // tx2, tx3: only a changes again
    Transaction.publish(spark, root, Map(
      "a" -> Seq((1, 0)).toDF("k", "n"), "b" -> Seq(10).toDF("m")))
    Transaction.publish(spark, root, Map("a" -> Seq((1, 1)).toDF("k", "n")))
    Transaction.publish(spark, root, Map("a" -> Seq((1, 2)).toDF("k", "n")))
    Transaction.tag(spark, root, "release", 1L)
    Transaction.publish(spark, root, Map("a" -> Seq((1, 3)).toDF("k", "n")))
    // keep=1 would keep only tx3, but the tag pins tx1
    val dropped = Transaction.vacuum(spark, root, keep = 1)
    assert(dropped == Seq(0L, 2L))
    // tagged read still works end-to-end
    assert(Transaction.readRef(spark, root, "a", "release")
      .as[(Int, Int)].head() == ((1, 1)))
    // b's ONLY version (t0, written in dropped tx0) survives because
    // kept manifests still reference it — the reachability law
    assert(Transaction.read(spark, root, "b").as[Int].head() == 10)
    // dropped tx manifests are gone; kept ones resolve
    assert(Transaction.committedTxs(spark, root) == Seq(1L, 3L))
    intercept[IllegalArgumentException] {
      Transaction.read(spark, root, "a", Some(2L))
    }
    // a's unreachable version dirs were deleted, reachable kept
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val aVersions = fs.listStatus(new Path(root, "a"))
      .map(_.getPath.getName).toSet
    assert(aVersions == Set("t1", "t3"))
  }

  test("re-tagging moves the name; tagging uncommitted tx fails") {
    val root = freshRoot()
    Transaction.publish(spark, root, Map("a" -> Seq(1).toDF("k")))
    Transaction.publish(spark, root, Map("a" -> Seq(2).toDF("k")))
    Transaction.tag(spark, root, "prod", 0L)
    Transaction.tag(spark, root, "prod", 1L)
    assert(Transaction.refTx(spark, root, "prod") == 1L)
    intercept[IllegalArgumentException] {
      Transaction.tag(spark, root, "prod", 99L)
    }
  }

  test("streaming publish: EVERY committed tx pairs its summary with " +
      "exactly its deltas (cross-table atomicity under micro-batches)") {
    import org.apache.spark.sql.functions._
    val txRoot = graft.streaming.Streams
      .txPublishViaStream(spark, "/root/testdata/sf0.001")
    val txs = Transaction.committedTxs(spark, txRoot)
    assert(txs.size >= 2, s"expected several micro-batch txs, got $txs")
    for (tx <- txs) {
      // re-fold the deltas of tx 0..tx: every committed snapshot must
      // be internally consistent, not just the last one
      val deltas = txs.filter(_ <= tx).map(t =>
        Transaction.read(spark, txRoot, "delta", Some(t)))
        .reduce(_ unionByName _)
      val refold = deltas.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
        .orderBy("event_type")
        .as[(String, Long, Long)].collect().toSeq
      val summary = Transaction.read(spark, txRoot, "summary", Some(tx))
        .orderBy("event_type")
        .as[(String, Long, Long)].collect().toSeq
      assert(summary == refold, s"tx $tx summary out of step with deltas")
    }
  }

  test("reading a table absent from the manifest fails loudly") {
    val root = freshRoot()
    Transaction.publish(spark, root, Map("a" -> Seq(1).toDF("k")))
    val e = intercept[IllegalArgumentException] {
      Transaction.read(spark, root, "missing")
    }
    assert(e.getMessage.contains("missing"))
  }
}
