package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoinLast picks the latest right row at or before left ts") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 205L), (3L, "u2", 50L), (4L, "u3", 10L))
      .toDF("id", "k", "ts")
    val right = Seq(
      ("u1", 90L, 9.0), ("u1", 100L, 10.0), ("u1", 300L, 30.0),
      ("u2", 60L, 6.0))
      .toDF("k", "rts", "v")
    val out = Joins.asofJoinLast(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "asof_v").collect().map(r =>
        r.getLong(0) -> Option(r.get(1))).toMap
    // id=1: right at ts=100 exactly → visible (>= semantics), beats 90
    assert(out(1L) === Some(10.0))
    // id=2: latest <= 205 is 100
    assert(out(2L) === Some(10.0))
    // id=3: right u2 at 60 > 50 → nothing before
    assert(out(3L) === None)
    // id=4: no right rows for u3
    assert(out(4L) === None)
  }

  test("asofJoinLast preserves NULLs in the matched right row and never " +
      "mixes columns across right rows") {
    val left = Seq((1L, "k", 20L)).toDF("id", "k", "ts")
    // latest right row at ts=10 has a=NULL, b=7; older row has a=3, b=5.
    // ASOF must return (NULL, 7) — not fall back to a=3, and not mix.
    val right = Seq(
      ("k", 5L, Some(3.0), Some(5.0)),
      ("k", 10L, Option.empty[Double], Some(7.0)))
      .toDF("k", "rts", "a", "b")
    val out = Joins.asofJoinLast(left, right, Seq("k"), "ts", "rts",
      Seq("a", "b")).select("asof_a", "asof_b").head
    assert(out.isNullAt(0), s"expected NULL asof_a, got ${out.get(0)}")
    assert(out.getDouble(1) == 7.0)
  }

  test("asofJoinLast never matches NULL keys (equi-join semantics)") {
    val left = Seq((1L, Option.empty[String], 20L), (2L, Some("k"), 20L))
      .toDF("id", "k", "ts")
    val right = Seq((Option.empty[String], 10L, 7.0), (Some("k"), 10L, 9.0))
      .toDF("k", "rts", "v")
    val out = Joins.asofJoinLast(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isEmpty, "NULL = NULL must not match in an ASOF join")
    assert(out(2L).contains(9.0))
  }

  test("asofJoinLast matches a naive theta-join + argmax oracle") {
    val left = (1 to 200).map(i => (i.toLong, s"k${i % 7}", (i * 13 % 97).toLong))
      .toDF("id", "k", "ts")
    val right = (1 to 150).map(i => (s"k${i % 7}", (i * 29 % 97).toLong, i.toDouble))
      .toDF("k", "rts", "v")
    // naive: theta join, keep max (rts, v) per left row — ties on rts
    // broken by max v is NOT what asof does; make rts unique per key first
    val rightU = right.groupBy("k", "rts").agg(max("v").as("v"))
    val fast = Joins.asofJoinLast(left, rightU, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "asof_v")
    val naive = left.join(rightU,
        left("k") === rightU("k") && col("rts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(left("id")).orderBy(col("rts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(left("id"), col("v").as("asof_v"))
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("saltedEquiJoin equals the plain join") {
    val large = (1 to 500).map(i => (i.toLong % 11, i.toLong, i * 1.5))
      .toDF("key", "payload", "x")
    val small = (0L to 10L).map(k => (k, s"dim$k")).toDF("key", "name")
    val plain = large.join(small, Seq("key")).select("key", "payload", "x", "name")
    val salted = Joins.saltedEquiJoin(large, small, "key", buckets = 4,
        saltFrom = Seq(col("payload")))
      .select("key", "payload", "x", "name")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salting spreads a hot key across shuffle partitions") {
    // one key carries 90% of rows: unsalted, all its rows hash to ONE
    // shuffle partition; salted over 8 buckets they must land in >1
    val large = ((1 to 900).map(_ => (7L, "hot")) ++
      (1 to 100).map(i => (i.toLong % 5, "cold"))).toDF("key", "tag")
      .withColumn("rid", monotonically_increasing_id())
    val small = (0L to 10L).map(k => (k, s"d$k")).toDF("key", "name")
    val salted = Joins.saltedEquiJoin(large, small, "key", buckets = 8,
      saltFrom = Seq(col("rid")))
    val spread = large
      .withColumn("salt", pmod(xxhash64(col("rid")), lit(8L)).cast("int"))
      .filter(col("key") === 7L).select("salt").distinct().count()
    assert(spread > 1, s"hot key stayed in $spread salt bucket(s)")
    assert(salted.count() === 1000)
  }

  test("AQE skew split declines when the join feeds a same-key aggregate; " +
      "salting still spreads") {
    // The operator-choice boundary for 100 TB skew (SCALE.md): AQE's
    // OptimizeSkewedJoin splits a skewed SMJ partition only when no
    // parent requires the join's hash partitioning — splitting
    // replicates the partition across tasks, which would corrupt a
    // downstream same-key aggregate that reuses the exchange, so by
    // default (forceOptimizeSkewedJoin=false) AQE declines and the hot
    // key stays one straggler task. PlanSpec's twin test shows the
    // shape AQE DOES fix (join → shuffle boundary); this one plants the
    // join → groupBy(joinKey) shape and asserts AQE leaves it skewed,
    // while saltedEquiJoin — joining on (key, salt) — spreads the hot
    // key regardless, because the aggregate's own shuffle restores
    // key partitioning afterwards.
    val resets = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
      .map { case (k, v) =>
        val prev = spark.conf.getOption(k); spark.conf.set(k, v); k -> prev }
    try {
      val fact = ((1 to 50000).map(_ => 7L) ++ (1 to 1000).map(_.toLong))
        .toDF("k").withColumn("payload", lit("x" * 64))
        .withColumn("rid", monotonically_increasing_id())
      val dim = (1 to 1000).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      val plain = fact.join(dim, "k")
        .groupBy("k").agg(sum(length(col("payload"))).as("n"))
      plain.collect()
      val p = plain.queryExecution.executedPlan.toString()
      assert(!p.contains("skew=true"),
        s"expected AQE to DECLINE the skew split under a same-key agg:\n$p")
      // salted twin: identical answer, hot key crosses the join shuffle
      // in >1 bucket
      val salted = Joins.saltedEquiJoin(fact, dim, "k", buckets = 8,
          saltFrom = Seq(col("rid")))
        .groupBy("k").agg(sum(length(col("payload"))).as("n"))
      assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
      val spread = fact
        .withColumn("salt", pmod(xxhash64(col("rid")), lit(8L)).cast("int"))
        .filter(col("k") === 7L).select("salt").distinct().count()
      assert(spread > 1, s"hot key stayed in $spread salt bucket(s)")
    } finally resets.foreach { case (k, prev) =>
      prev.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("nullSafeLeftJoin equals the plain left join, nulls unmatched") {
    val left = Seq[(Long, java.lang.Long, Double)](
      (1L, 10L, 1.0), (2L, null, 2.0), (3L, 20L, 3.0), (4L, null, 4.0),
      (5L, 99L, 5.0)).toDF("id", "k", "v")
    val right = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("rk", "name")
    val got = Joins.nullSafeLeftJoin(left, right, "k", "rk")
      .select("id", "k", "v", "rk", "name")
      .collect().map(_.toSeq).toSet
    val want = left.join(right, col("k") === col("rk"), "left")
      .select("id", "k", "v", "rk", "name")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    // every null-key row survives exactly once, right side null-extended
    assert(got.count(r => r(1) == null) == 2)
    assert(got.filter(r => r(1) == null).forall(r =>
      r(3) == null && r(4) == null))
    // unmatched non-null key (99) also null-extends, as in a left join
    assert(got.exists(r => r(0) == 5L && r(4) == null))
  }

  test("pointInIntervalJoin matches a naive theta-join oracle") {
    // deterministic pseudo-random points/intervals across 5 keys;
    // interval lengths straddle the bucket width (some span 0 buckets'
    // worth, some several), so the explode path and the single-bucket
    // path are both exercised
    val points = (1 to 300).map { i =>
      (s"k${i % 5}", i.toLong, (i * 37 % 1000).toLong)
    }.toDF("k", "pid", "p")
    val intervals = (1 to 80).map { i =>
      val s = (i * 83 % 950).toLong
      (s"k${i % 5}", i.toLong, s, s + (i * 17 % 130).toLong)
    }.toDF("k", "iid", "s", "e")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("k", "pid", "iid")
    val binned = Joins.pointInIntervalJoin(points, intervals, Seq("k"),
        "p", "s", "e", bucketWidth = 64)
      .select("k", "pid", "iid")
    assert(binned.count() === naive.count())
    assert(binned.except(naive).isEmpty && naive.except(binned).isEmpty)
  }

  test("pointInIntervalJoin is exact on bucket boundaries and inclusive " +
      "bounds, and drops NULL/degenerate rows") {
    val points = Seq(
      ("k", 1L, Some(64L)),  // exactly on a bucket boundary
      ("k", 2L, Some(63L)),  // last position of bucket 0
      ("k", 3L, Some(10L)),
      ("k", 4L, Option.empty[Long])  // NULL position → dropped
    ).toDF("k", "pid", "p")
    val intervals = Seq(
      ("k", 10L, Some(64L), Some(64L)),  // single-point interval ON boundary
      ("k", 11L, Some(0L), Some(63L)),   // exactly bucket 0
      ("k", 12L, Some(63L), Some(65L)),  // straddles the boundary
      ("k", 13L, Some(50L), Some(40L)),  // degenerate: start > end → dropped
      ("k", 14L, Option.empty[Long], Some(9L)) // NULL start → dropped
    ).toDF("k", "iid", "s", "e")
    val out = Joins.pointInIntervalJoin(points, intervals, Seq("k"),
        "p", "s", "e", bucketWidth = 64)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out === Set((1L, 10L), (1L, 12L), (2L, 11L), (2L, 12L),
      (3L, 11L)))
  }

  test("pointInIntervalJoin plans as an equi join, not a nested loop") {
    val points = (1 to 50).map(i => (s"k${i % 3}", (i * 7 % 100).toLong))
      .toDF("k", "p")
    val intervals = (1 to 20).map(i =>
      (s"k${i % 3}", (i * 11 % 90).toLong, (i * 11 % 90 + 15).toLong))
      .toDF("k", "s", "e")
    val plan = Joins.pointInIntervalJoin(points, intervals, Seq("k"),
      "p", "s", "e", bucketWidth = 16).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"binned interval join must be an equi join:\n$plan")
  }

  test("saltedEquiJoin keeps rows whose salt source collides") {
    // all salt-source values identical → one salt bucket gets everything;
    // still correct, just unspread
    val large = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("key", "tag")
      .withColumn("const", lit(42))
    val small = Seq((1L, "one"), (2L, "two")).toDF("key", "name")
    val out = Joins.saltedEquiJoin(large, small, "key", 8, Seq(col("const")))
    assert(out.count() === 3)
  }
}
