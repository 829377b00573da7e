package graft

import org.apache.spark.sql.functions._

import graft.tools.Lineage

/** Column lineage walker: scans name their table, computed columns
  * union their references, joins pass both sides through, aggregates
  * and windows attribute to the referenced measures, unions merge
  * positionally, and renames don't launder provenance.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val (aPath, bPath) = {
    val base = tmpDir("lineage_spec")
    (1 to 10).map(i => (i.toLong, i * 2.0, s"k$i"))
      .toDF("id", "v", "k").write.parquet(s"$base/ta.parquet")
    (1 to 10).map(i => (i.toLong, i % 3))
      .toDF("id", "g").write.parquet(s"$base/tb.parquet")
    (s"$base/ta.parquet", s"$base/tb.parquet")
  }

  test("computed column unions its references; rename keeps provenance") {
    val df = spark.read.parquet(aPath)
      .select(col("id").as("renamed_id"), (col("v") * 2).as("v2"))
    val m = Lineage.of(df).toMap
    assert(m("renamed_id") == Set("ta" -> "id"))
    assert(m("v2") == Set("ta" -> "v"))
  }

  test("join + aggregate: group key and measure attribute correctly") {
    val a = spark.read.parquet(aPath)
    val b = spark.read.parquet(bPath)
    val df = a.join(b, "id").groupBy("g")
      .agg(sum(col("v") * col("g")).as("weighted"))
    val m = Lineage.of(df).toMap
    assert(m("g") == Set("tb" -> "g"))
    assert(m("weighted") == Set("ta" -> "v", "tb" -> "g"))
  }

  test("union merges sources positionally") {
    val a = spark.read.parquet(aPath).select(col("id"), col("v"))
    val b = spark.read.parquet(bPath)
      .select(col("id"), col("g").cast("double").as("v"))
    val m = Lineage.of(a.unionByName(b)).toMap
    assert(m("v") == Set("ta" -> "v", "tb" -> "g"))
    assert(m("id") == Set("ta" -> "id", "tb" -> "id"))
  }

  test("window expressions attribute to their measure and nothing else") {
    val df = spark.read.parquet(aPath)
      .withColumn("rsum", sum("v").over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy("id")))
      .select("k", "rsum")
    val m = Lineage.of(df).toMap
    assert(m("k") == Set("ta" -> "k"))
    // value lineage: the running sum's VALUE comes from v (and the
    // frame columns it references in the window spec)
    assert(m("rsum").contains("ta" -> "v"))
  }

  test("declared q_lineage rows are exactly the pinned set") {
    val rows = SparkEntry.queries("q_lineage")(
      spark, "/root/testdata/sf0.001")
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("n_name", "nation", "n_name"),
      ("revenue", "lineitem", "l_discount"),
      ("revenue", "lineitem", "l_extendedprice")))
  }
}
