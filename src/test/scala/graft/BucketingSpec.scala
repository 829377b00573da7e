package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: both join sides persisted bucketed on
  * the join key means the sort-merge join reads co-located buckets and
  * plans NO Exchange — the SURVEY §7 "co-locate joins via bucketing"
  * rule, demonstrated against the actual plan. At 100 TB this converts
  * every recurring fact⋈fact join on the bucket key from a full
  * shuffle of both tables into a local merge per bucket.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans no Exchange") {
    // tables land in the default warehouse dir (./spark-warehouse,
    // gitignored) — warehouse.dir is a static conf on the shared session
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
      (1 to 10000).map(i => (i.toLong % 500, i.toLong, i * 1.5))
        .toDF("k", "payload", "x")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_bucket_l")
      (1 to 2000).map(i => (i.toLong % 500, s"dim$i"))
        .toDF("k", "name")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_bucket_r")

      val joined = spark.table("graft_bucket_l")
        .join(spark.table("graft_bucket_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")

      // and the answer matches the unbucketed join, values included
      val flat = joined.agg(count(lit(1)), round(sum("x"), 2)).head
      val want = (1 to 10000).map(i => (i.toLong % 500, i * 1.5))
        .flatMap { case (k, x) =>
          (1 to 2000).filter(_.toLong % 500 == k).map(_ => x) }
      assert(flat.getLong(0) == want.size)
      assert(flat.getDouble(1) ==
        BigDecimal(want.sum).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
    }
  }

  test("q_bucketed_join: join side reads buckets, no join Exchange") {
    val df = SparkEntry.queries("q_bucketed_join")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
    // the only shuffles are the 4-row agg + final sort — the join
    // itself must not repartition either side
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"join must not shuffle (got $hashEx hash exchanges):\n$plan")
    assert(df.count() > 0)
  }

  test("point lookups on the bucket column open only their buckets") {
    val df = SparkEntry.queries("q_bucket_prune")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString()
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"expected bucket pruning in the scan:\n$plan")
    val (selected, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(total == 16 && selected <= 3,
      s"3 keys must select <=3 of 16 buckets, got $selected/$total")
  }
}
