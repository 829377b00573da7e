package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.MergeOnRead

/** Laws of merge-on-read deletes: appends never touch base data,
  * re-deletes are idempotent, compaction preserves the view and
  * returns the read path to a plain scan.
  */
class MorDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(root: String): Set[(String, Long)] = {
    val p = new Path(s"$root/data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(s => (s.getPath.getName, s.getLen)).toSet
  }

  test("delete appends a tombstone; base data files are untouched") {
    val root = tmpDir("graft_mor")
    MergeOnRead.init(Seq((1, "a"), (7, "b"), (14, "c"), (3, "d"))
      .toDF("k", "v"), root)
    val before = dataFiles(root)
    val n = MergeOnRead.deleteWhere(spark, root, "k", col("k") % 7 === 0)
    assert(n == 2)
    assert(dataFiles(root) == before, "base data must not be rewritten")
    val got = MergeOnRead.readCurrent(spark, root, "k")
      .orderBy("k").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a"), (3, "d")))
  }

  test("re-deleting already-tombstoned keys is a no-op (idempotent)") {
    val root = tmpDir("graft_mor")
    MergeOnRead.init(Seq((7, "x"), (2, "y")).toDF("k", "v"), root)
    assert(MergeOnRead.deleteWhere(spark, root, "k",
      col("k") === 7) == 1)
    assert(MergeOnRead.deleteWhere(spark, root, "k",
      col("k") === 7) == 0, "victims come from the CURRENT view")
    assert(MergeOnRead.readCurrent(spark, root, "k").count() == 1)
  }

  test("property: any interleaving of deletes and compactions equals " +
      "the running batch filter") {
    // deterministic pseudo-random predicates from a seeded sequence;
    // compact after every 3rd delete — the view must equal filtering
    // the base by the conjunction of all predicates so far, at every
    // step
    val root = tmpDir("graft_mor_prop")
    val base = (1 to 500).map(i => (i, (i * 2654435761L % 97).toInt))
      .toDF("k", "v")
    MergeOnRead.init(base, root)
    var kept = base
    for (step <- 1 to 7) {
      val m = 3 + (step * 7919) % 11 // modulus 3..13, deterministic
      val r = (step * 104729) % m
      val pred = col("k") % m === r
      MergeOnRead.deleteWhere(spark, root, "k", pred)
      kept = kept.filter(!(col("k") % m === r))
      if (step % 3 == 0) MergeOnRead.compact(spark, root, "k")
      val got = MergeOnRead.readCurrent(spark, root, "k")
        .as[(Int, Int)].collect().toSeq.sorted
      val want = kept.as[(Int, Int)].collect().toSeq.sorted
      assert(got == want, s"diverged at step $step (m=$m r=$r)")
    }
    assert(MergeOnRead.readCurrent(spark, root, "k").count() > 0)
  }

  test("compaction preserves the view exactly and clears tombstones; " +
      "the read plan is a plain scan afterwards") {
    val root = tmpDir("graft_mor")
    MergeOnRead.init((1 to 100).map(i => (i, i * 10)).toDF("k", "n"), root)
    MergeOnRead.deleteWhere(spark, root, "k", col("k") % 3 === 0)
    MergeOnRead.deleteWhere(spark, root, "k", col("k") > 90)
    val before = MergeOnRead.readCurrent(spark, root, "k")
      .orderBy("k").as[(Int, Int)].collect().toSeq
    assert(MergeOnRead.compact(spark, root, "k") == 2)
    val after = MergeOnRead.readCurrent(spark, root, "k")
      .orderBy("k").as[(Int, Int)].collect().toSeq
    assert(after == before)
    // tombstones folded: no join left on the read path
    val plan = MergeOnRead.readCurrent(spark, root, "k")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"post-compaction read must be a scan:\n$plan")
    // compacting again is a no-op
    assert(MergeOnRead.compact(spark, root, "k") == 0)
  }
}
