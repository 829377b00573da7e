package graft

import org.apache.spark.sql.functions._

import graft.operators.Ops

/** Laws of the SCD2 dimension-history merge ([[Ops.scd2Merge]]):
  * exactly one open row per key, closed rows chain valid_from→valid_to
  * without overlap, unchanged attributes are a no-op (idempotence), and
  * history is append-only across merges.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: (Long, String, Double, Long)*) =
    rows.toDF("id", "tier", "score", "etl_updated_ts")

  private def snapshot(path: String) =
    spark.read.parquet(path)
      .select("id", "tier", "score", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Double, Long, Option[Long], Boolean)]
      .collect().toSet

  test("new key, changed key, unchanged key, late history") {
    val path = java.nio.file.Files
      .createTempDirectory("scd2spec").toString + "/dim"
    // v1: two keys
    Ops.scd2Merge(spark, path, dim((1L, "gold", 1.0, 1L),
      (2L, "silver", 2.0, 1L)), Seq("id"))
    assert(snapshot(path) == Set(
      (1L, "gold", 1.0, 1L, None, true),
      (2L, "silver", 2.0, 1L, None, true)))
    // v2: key 1 changes tier, key 2 unchanged, key 3 new
    Ops.scd2Merge(spark, path, dim((1L, "platinum", 1.0, 2L),
      (2L, "silver", 2.0, 2L), (3L, "bronze", 3.0, 2L)), Seq("id"))
    val afterV2 = Set(
      (1L, "gold", 1.0, 1L, Some(2L), false),
      (1L, "platinum", 1.0, 2L, None, true),
      (2L, "silver", 2.0, 1L, None, true), // unchanged: still v1-open
      (3L, "bronze", 3.0, 2L, None, true))
    assert(snapshot(path) == afterV2)
    // re-merging the identical batch is a no-op (idempotence law)
    Ops.scd2Merge(spark, path, dim((1L, "platinum", 1.0, 2L),
      (2L, "silver", 2.0, 2L), (3L, "bronze", 3.0, 2L)), Seq("id"))
    assert(snapshot(path) == afterV2)
    // v3: key 1 changes again — history now chains 1→2→open
    Ops.scd2Merge(spark, path, dim((1L, "diamond", 9.0, 3L)), Seq("id"))
    assert(snapshot(path) == afterV2 - ((1L, "platinum", 1.0, 2L, None, true)) +
      ((1L, "platinum", 1.0, 2L, Some(3L), false)) +
      ((1L, "diamond", 9.0, 3L, None, true)))
  }

  test("invariants: one open row per key, no overlapping ranges") {
    val path = java.nio.file.Files
      .createTempDirectory("scd2spec_inv").toString + "/dim"
    Ops.scd2Merge(spark, path,
      dim((1L, "a", 1.0, 1L), (2L, "a", 1.0, 1L)), Seq("id"))
    Ops.scd2Merge(spark, path,
      dim((1L, "b", 1.0, 2L), (2L, "a", 9.0, 2L)), Seq("id"))
    Ops.scd2Merge(spark, path, dim((1L, "c", 1.0, 3L)), Seq("id"))
    val t = spark.read.parquet(path)
    val perKeyOpen = t.filter(col("is_current"))
      .groupBy("id").count().select("count").as[Long].collect()
    assert(perKeyOpen.forall(_ == 1L))
    // closed rows end exactly where the successor begins
    val rows = t.select("id", "valid_from", "valid_to")
      .as[(Long, Long, Option[Long])].collect()
      .groupBy(_._1).values
    rows.foreach { versions =>
      val sorted = versions.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to == from)
        case _ => ()
      }
      assert(sorted.init.forall(_._3.isDefined) && sorted.last._3.isEmpty)
    }
  }

  test("late batch (version <= open row's valid_from) is a no-op") {
    val path = java.nio.file.Files
      .createTempDirectory("scd2spec_late").toString + "/dim"
    Ops.scd2Merge(spark, path, dim((1L, "v1", 1.0, 1L)), Seq("id"))
    Ops.scd2Merge(spark, path, dim((1L, "v3", 3.0, 3L)), Seq("id"))
    val after = snapshot(path)
    // a straggler carrying the OLD attrs at an old version must not
    // close the newer open row or resurrect stale data as current
    Ops.scd2Merge(spark, path, dim((1L, "v2-late", 2.0, 2L)), Seq("id"))
    assert(snapshot(path) == after)
    // equal-version different-attrs is also late (closing would make a
    // zero-length interval)
    Ops.scd2Merge(spark, path, dim((1L, "v3-conflict", 9.0, 3L)), Seq("id"))
    assert(snapshot(path) == after)
  }

  test("closed-history directories are byte-identical across merges") {
    import java.nio.file.{Files, Path => JPath, Paths}
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("scd2spec_part").toString
    val path = root + "/dim"
    Ops.scd2Merge(spark, path, dim((1L, "a", 1.0, 1L),
      (2L, "a", 1.0, 1L), (3L, "a", 1.0, 1L)), Seq("id"))
    // v2 closes keys 1 and 2 into the c2 directory
    Ops.scd2Merge(spark, path,
      dim((1L, "b", 1.0, 2L), (2L, "b", 1.0, 2L)), Seq("id"))
    def dirBytes(dir: String): Map[String, Seq[Byte]] = {
      val d = Paths.get(path, dir)
      Files.walk(d).iterator().asScala.filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(p => d.relativize(p).toString ->
          Files.readAllBytes(p).toSeq).toMap
    }
    val c2Before = dirBytes(s"${Ops.ScdPartCol}=c2")
    assert(c2Before.nonEmpty)
    // v3 touches only key 3: its open row closes into c3; the c2
    // directory (keys 1 and 2's closed rows) must not be rewritten
    Ops.scd2Merge(spark, path, dim((3L, "c", 9.0, 3L)), Seq("id"))
    assert(dirBytes(s"${Ops.ScdPartCol}=c2") == c2Before,
      "previously-closed history directory was rewritten")
    assert(dirBytes(s"${Ops.ScdPartCol}=c3").nonEmpty)
    // full-table read still correct after both merges
    assert(snapshot(path) == Set(
      (1L, "a", 1.0, 1L, Some(2L), false),
      (1L, "b", 1.0, 2L, None, true),
      (2L, "a", 1.0, 1L, Some(2L), false),
      (2L, "b", 1.0, 2L, None, true),
      (3L, "a", 1.0, 1L, Some(3L), false),
      (3L, "c", 9.0, 3L, None, true)))
  }

  test("legacy flat SCD2 target is migrated into the partitioned layout") {
    val path = java.nio.file.Files
      .createTempDirectory("scd2spec_mig").toString + "/dim"
    // hand-write a FLAT (unpartitioned) target in the pre-round-3 shape
    Seq((1L, "a", 1.0, 1L, Some(2L), false),
      (1L, "b", 1.0, 2L, None: Option[Long], true),
      (2L, "a", 4.0, 1L, None: Option[Long], true))
      .toDF("id", "tier", "score", "valid_from", "valid_to", "is_current")
      .write.parquet(path)
    Ops.scd2Merge(spark, path, dim((2L, "z", 5.0, 3L)), Seq("id"))
    assert(graft.operators.ParquetIO
      .isPartitionedOn(spark, path, Ops.ScdPartCol))
    assert(snapshot(path) == Set(
      (1L, "a", 1.0, 1L, Some(2L), false),
      (1L, "b", 1.0, 2L, None, true),
      (2L, "a", 4.0, 1L, Some(3L), false),
      (2L, "z", 5.0, 3L, None, true)))
  }

  test("latest-wins dedup inside one batch") {
    val path = java.nio.file.Files
      .createTempDirectory("scd2spec_dd").toString + "/dim"
    Ops.scd2Merge(spark, path, dim((1L, "a", 1.0, 1L)), Seq("id"))
    // one batch carries two versions of key 1: only ts=3 survives
    Ops.scd2Merge(spark, path,
      dim((1L, "mid", 5.0, 2L), (1L, "late", 7.0, 3L)), Seq("id"))
    assert(snapshot(path) == Set(
      (1L, "a", 1.0, 1L, Some(3L), false),
      (1L, "late", 7.0, 3L, None, true)))
  }
}
