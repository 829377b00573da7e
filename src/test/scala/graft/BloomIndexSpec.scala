package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomIndex

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def seed(n: Int, files: Int): String = {
    val path = tmpDir("bloom") + "/t"
    val df = spark.range(n.toLong)
      .select(col("id").as("k"), (col("id") * 7 % 100).as("v"))
    BloomIndex.build(df, path, "k", numFiles = files)
    path
  }

  test("no false negatives: every present key's rows always survive " +
    "the prune") {
    val path = seed(10000, 16)
    val keys = Seq(0L, 17L, 4242L, 9999L)
    val got = BloomIndex.read(spark, path, "k", keys)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got === keys.sorted)
  }

  test("pruning is a strict subset on a spread layout and exact " +
    "results carry no false positives") {
    val path = seed(20000, 16)
    val (files, total) = BloomIndex.pruneFiles(spark, path, Seq(123L))
    assert(total === 16)
    assert(files.nonEmpty && files.size < total,
      s"a single-key probe should skip most of the $total files, " +
        s"kept ${files.size}")
    // absent key: typically zero files survive; rows NEVER do
    val absent = BloomIndex.read(spark, path, "k", Seq(999999L))
    assert(absent.count() === 0)
    assert(absent.columns.toSeq === Seq("k", "v"),
      "empty prune must preserve the schema")
  }

  test("multi-key probes union their file sets") {
    val path = seed(20000, 16)
    val single = BloomIndex.pruneFiles(spark, path, Seq(5L))._1.toSet
    val multi = BloomIndex.pruneFiles(spark, path,
      Seq(5L, 18765L))._1.toSet
    assert(single.subsetOf(multi))
    val got = BloomIndex.read(spark, path, "k", Seq(5L, 18765L))
      .select("k").as[Long].collect().toSet
    assert(got === Set(5L, 18765L))
  }

  test("string keys probe through the same engine hash") {
    val path = tmpDir("bloom_s") + "/t"
    val df = spark.range(5000)
      .select(concat(lit("user-"), col("id")).as("k"), col("id").as("v"))
    BloomIndex.build(df, path, "k", numFiles = 8)
    val got = BloomIndex.read(spark, path, "k",
      Seq("user-77", "user-4999", "user-nope"))
      .select("k").as[String].collect().toSet
    assert(got === Set("user-77", "user-4999"))
    val (files, total) = BloomIndex.pruneFiles(spark, path, Seq("user-77"))
    assert(files.size < total)
  }
}
