package graft

import org.apache.spark.sql.functions._

import graft.operators.ZoneMap

/** Zone-map skipping index: pruning must be a STRICT subset of the
  * file list on a selective range (the whole point), the pruned read
  * must equal the full-scan filter exactly (intervals over-approximate
  * but the operator re-applies the predicate), and the empty-range
  * probe must prune everything yet keep the schema.
  */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = (1 to 1000)
    .map(i => (i.toLong, i % 7, f"d${i % 400}%03d"))
    .toDF("id", "grp", "key")

  private lazy val path = {
    val p = tmpDir("zonemap_spec") + "/t"
    ZoneMap.build(data, p, "key", numFiles = 10)
    p
  }

  test("selective range prunes a strict subset of files") {
    val (hit, total) = ZoneMap.pruneFiles(spark, path, "d100", "d150")
    assert(total == 10)
    assert(hit.nonEmpty && hit.size < total,
      s"expected strict pruning, got ${hit.size}/$total files")
  }

  test("pruned read equals the full-scan filter, row for row") {
    val pruned = ZoneMap.read(spark, path, "key", "d100", "d150")
      .orderBy("id").collect().toSeq
    val full = spark.read.parquet(path)
      .filter(col("key") >= "d100" && col("key") < "d150")
      .orderBy("id").collect().toSeq
    assert(pruned == full)
    assert(pruned.nonEmpty)
  }

  test("range beyond all zones prunes every file, schema intact") {
    val (hit, _) = ZoneMap.pruneFiles(spark, path, "x", "y")
    assert(hit.isEmpty)
    val df = ZoneMap.read(spark, path, "key", "x", "y")
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("id", "grp", "key"))
  }

  test("zone intervals are near-disjoint under the range layout") {
    val zm = spark.read.parquet(s"${path}_zonemap")
      .select("lo", "hi").as[(String, String)].collect().sortBy(_._1)
    // range partitioning ⇒ each file's hi <= next file's hi, and
    // overlap limited to boundary values
    zm.sliding(2).foreach {
      case Array((_, h1), (l2, _)) => assert(h1 <= l2)
      case _ =>
    }
    val rows = spark.read.parquet(s"${path}_zonemap")
      .agg(sum("n_rows")).head.getLong(0)
    assert(rows == 1000L)
  }
}
