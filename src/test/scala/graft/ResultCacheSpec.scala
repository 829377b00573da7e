package graft

import org.apache.spark.sql.functions._

import graft.plans.ResultCache

/** Result cache: miss-then-hit on the same plan, fingerprint collision
  * across syntactically different but semantically identical builds
  * (the canonicalization claim), separation for genuinely different
  * plans, and exactness of the served rows.
  */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = {
    val p = tmpDir("rc_spec") + "/t"
    (1 to 500).map(i => (i.toLong, i % 5, i * 1.5))
      .toDF("id", "g", "v").write.parquet(p)
    p
  }

  test("second call with the same plan is a hit, rows identical") {
    val root = tmpDir("rc_root")
    def q = spark.read.parquet(base).groupBy("g")
      .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("s"))
    val (r1, hit1) = ResultCache.cached(q, root)
    val (r2, hit2) = ResultCache.cached(q, root)
    assert(!hit1 && hit2)
    assert(r1.orderBy("g").collect().toSeq
      == r2.orderBy("g").collect().toSeq)
    assert(r2.orderBy("g").collect().toSeq
      == q.orderBy("g").collect().toSeq)
  }

  test("alias-renamed build collides onto the same entry") {
    val root = tmpDir("rc_root2")
    val a = spark.read.parquet(base)
      .filter(col("g") === 2)
      .select(col("id"), col("v"))
    val b = spark.read.parquet(base)
      .filter(col("g") === lit(2))
      .select(col("id").as("id"), col("v").as("v"))
    assert(ResultCache.fingerprint(a) == ResultCache.fingerprint(b))
    val (_, hit1) = ResultCache.cached(a, root)
    val (_, hit2) = ResultCache.cached(b, root)
    assert(!hit1 && hit2)
  }

  test("different literal or column is a different entry") {
    val a = spark.read.parquet(base).filter(col("g") === 2)
    val b = spark.read.parquet(base).filter(col("g") === 3)
    val c = spark.read.parquet(base).filter(col("id") === 2)
    assert(ResultCache.fingerprint(a) != ResultCache.fingerprint(b))
    assert(ResultCache.fingerprint(a) != ResultCache.fingerprint(c))
  }

  test("STALENESS: appending to a plain parquet base retires the " +
      "entry — the pre-update fingerprint can never serve again") {
    val root = tmpDir("rc_root3")
    val t = tmpDir("rc_mut") + "/t"
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.parquet(t)
    def q = spark.read.parquet(t)
      .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("s"))
    val fp1 = ResultCache.fingerprint(q)
    val (r1, hit1) = ResultCache.cached(q, root)
    assert(!hit1 && r1.head.getLong(0) == 100L)
    // mutate the base: append 50 rows (new part files)
    (101 to 150).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.mode("append").parquet(t)
    val q2 = q // rebuilt: fresh file listing
    assert(ResultCache.fingerprint(q2) != fp1,
      "file-listing salt must move the key when the data moves")
    val (r2, hit2) = ResultCache.cached(q2, root)
    assert(!hit2, "a mutated base must MISS, never serve the old rows")
    assert(r2.head.getLong(0) == 150L)
    // and the new snapshot caches normally
    val (_, hit3) = ResultCache.cached(q2, root)
    assert(hit3)
  }

  test("STALENESS: a table referenced ONLY through a scalar subquery " +
      "salts too — mutating it retires the entry") {
    val root = tmpDir("rc_root5")
    val t1 = tmpDir("rc_sq") + "/t1"
    val t2 = tmpDir("rc_sq") + "/t2"
    (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.parquet(t1)
    (1 to 10).map(i => (i.toLong, 50.0)).toDF("id", "cutoff")
      .write.parquet(t2)
    def q = {
      spark.read.parquet(t1).createOrReplaceTempView("rc_sq_t1")
      spark.read.parquet(t2).createOrReplaceTempView("rc_sq_t2")
      spark.sql("SELECT count(*) AS n FROM rc_sq_t1 " +
        "WHERE v < (SELECT max(cutoff) FROM rc_sq_t2)")
    }
    val fp1 = ResultCache.fingerprint(q)
    val (r1, hit1) = ResultCache.cached(q, root)
    assert(!hit1 && r1.head.getLong(0) == 49L)
    // mutate ONLY the subquery's table: the outer plan text is
    // unchanged, so without subquery salting this would HIT the stale
    // entry (plan.collect never descends into PlanExpression sub-plans)
    Seq((11L, 80.0)).toDF("id", "cutoff")
      .write.mode("append").parquet(t2)
    val q2 = q
    assert(ResultCache.fingerprint(q2) != fp1,
      "a subquery-only base table must salt the key")
    val (r2, hit2) = ResultCache.cached(q2, root)
    assert(!hit2 && r2.head.getLong(0) == 79L)
  }

  test("STALENESS: publishing graftsink v(k+1) retires entries " +
      "computed over v(k); time-travel pins stay version-stable") {
    val root = tmpDir("rc_root4")
    val t = tmpDir("rc_gs") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(t)
    def q = spark.read.format("graftsink").load(t)
      .agg(count(lit(1)).as("n"))
    val fp1 = ResultCache.fingerprint(q)
    val (r1, hit1) = ResultCache.cached(q, root)
    assert(!hit1 && r1.head.getLong(0) == 2L)
    // publish v1
    Seq((3L, "c")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(t)
    val q2 = q
    assert(ResultCache.fingerprint(q2) != fp1,
      "head-version salt must move the key on publish")
    val (r2, hit2) = ResultCache.cached(q2, root)
    assert(!hit2 && r2.head.getLong(0) == 3L)
    // a VERSION AS OF pin is immutable: same fingerprint before and
    // after further publishes — historical dashboards keep hitting
    def pinned = spark.read.format("graftsink")
      .option("version", 0).load(t)
      .agg(count(lit(1)).as("n"))
    val pfp = ResultCache.fingerprint(pinned)
    Seq((4L, "d")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(t)
    assert(ResultCache.fingerprint(pinned) == pfp,
      "a pinned snapshot's key must not move with the head")
  }

  test("STALENESS: a graftsink table whose PATH contains '@' still " +
      "salts by live head — publishing moves the key") {
    // ADVICE r9 (medium): the salt used to parse dir/pin out of the
    // DISPLAY NAME, truncating at the first '@' — a path like
    // .../user@host/t probed a nonexistent dir, head = constant -1,
    // so publishes never moved the key and stale entries served
    // silently. dir/pin now come from the Table object.
    val t = tmpDir("rc_at") + "/user@host/t"
    Seq((1L, "a")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(t)
    def q = spark.read.format("graftsink").load(t)
      .agg(count(lit(1)).as("n"))
    val fp1 = ResultCache.fingerprint(q)
    assert(ResultCache.fingerprint(q) == fp1,
      "same head -> stable fingerprint (the real dir was probed)")
    Seq((2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(t)
    assert(ResultCache.fingerprint(q) != fp1,
      "publishing to an '@'-path table must move the key")
    // and a version pin on the same path stays stable across publishes
    def pinned = spark.read.format("graftsink")
      .option("version", 0).load(t).agg(count(lit(1)).as("n"))
    val pfp = ResultCache.fingerprint(pinned)
    Seq((3L, "c")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(t)
    assert(ResultCache.fingerprint(pinned) == pfp)
  }

  test("STALENESS: a Spark-cached (InMemoryRelation) scan of a " +
      "mutable table salts THROUGH the cache — publish moves the key") {
    val t = tmpDir("rc_imr") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(t)
    val cached = spark.read.format("graftsink").load(t).cache()
    try {
      cached.count() // materialize the cache
      def q = cached.agg(count(lit(1)).as("n"))
      // the optimized plan is now an InMemoryRelation leaf; the salt
      // must descend into the cached query's plan and find the
      // unpinned graftsink scan (head salt)
      val fp1 = ResultCache.fingerprint(q)
      assert(ResultCache.fingerprint(q) == fp1,
        "same head -> stable fingerprint (no spurious uniqueness)")
      Seq((3L, "c")).toDF("k", "s").write.format("graftsink")
        .mode("append").save(t)
      assert(ResultCache.fingerprint(q) != fp1,
        "publish must move the key even behind .cache() — the entry " +
          "computed over v0 can never serve a post-publish query")
    } finally { cached.unpersist(); () }
  }

  test("fail-closed: an unversionable leaf (RDD scan) never produces " +
      "a stable key — permanent miss instead of silent staleness") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rdd = spark.sparkContext.parallelize(Seq(Row(1L), Row(2L)))
    val df = spark.createDataFrame(rdd,
      StructType(Seq(StructField("id", LongType))))
    val q = df.agg(count(lit(1)).as("n"))
    assert(ResultCache.fingerprint(q) != ResultCache.fingerprint(q),
      "an opaque leaf must salt with a uniqueness token per call")
    // and cached() must NOT materialize a write-only entry for it:
    // the key can never be served, so persisting is pure disk growth
    // (ADVICE r10) — result still correct, reported as a miss
    val root = tmpDir("rc_opaque")
    val (r1, hit1) = ResultCache.cached(q, root)
    val (r2, hit2) = ResultCache.cached(q, root)
    assert(!hit1 && !hit2, "opaque plans are permanent misses")
    assert(r1.collect().head.getLong(0) == 2L
      && r2.collect().head.getLong(0) == 2L)
    val entries = new java.io.File(root.stripPrefix("file:")).list()
    assert(entries == null || entries.isEmpty,
      s"opaque plan must not persist cache entries, found: " +
        s"${Option(entries).toSeq.flatten.mkString(",")}")
  }

  test("plan-embedded literal data is part of the key: two local " +
      "frames with the same schema but different rows hash apart") {
    // LocalRelation's rows are NOT printed in the canonicalized plan
    // string, so without a data salt `Seq(1)` and `Seq(2)` would
    // collide onto one entry and serve each other's results
    val a = Seq(1L).toDF("x").agg(sum("x").as("s"))
    val b = Seq(2L).toDF("x").agg(sum("x").as("s"))
    assert(ResultCache.fingerprint(a) != ResultCache.fingerprint(b))
    // while the SAME rows stay stable (cache still works for literals)
    val a2 = Seq(1L).toDF("x").agg(sum("x").as("s"))
    assert(ResultCache.fingerprint(a) == ResultCache.fingerprint(a2))
  }
}
