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

  test("reading a table absent from the manifest fails loudly") {
    val root = freshRoot()
    Transaction.publish(spark, root, Map("a" -> Seq(1).toDF("k")))
    val e = intercept[IllegalArgumentException] {
      Transaction.read(spark, root, "missing")
    }
    assert(e.getMessage.contains("missing"))
  }
}
