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
}
