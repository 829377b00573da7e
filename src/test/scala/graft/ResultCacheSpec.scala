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
}
