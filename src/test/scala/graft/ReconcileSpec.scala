package graft

import org.apache.spark.sql.functions._

import graft.operators.Ops

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  // target vs replica covering all four drift states, with nulls on
  // both sides of the comparison
  private val target = Seq(
    (1L, Some(10.0), "A"),           // unchanged
    (2L, Some(20.0), "B2"),          // changed (value)
    (3L, None: Option[Double], "C"), // changed (value -> null)
    (4L, Some(40.0), "D"),           // added
    (6L, None: Option[Double], "F")  // unchanged with null (null <=> null)
  ).toDF("k", "price", "status")

  private val replica = Seq(
    (1L, Some(10.0), "A"),
    (2L, Some(20.0), "B"),
    (3L, Some(30.0), "C"),
    (5L, Some(50.0), "E"),           // removed
    (6L, None: Option[Double], "F")
  ).toDF("k", "price", "status")

  test("applyPatch(replica, reconcilePatch(target, replica)) == target") {
    val patch = Ops.reconcilePatch(target, replica, Seq("k"))
    val repaired = Ops.applyPatch(replica, patch, Seq("k"))
      .as[(Long, Option[Double], String)].collect().toSet
    val want = target.as[(Long, Option[Double], String)].collect().toSet
    assert(repaired == want)
  }

  test("the patch is minimal: unchanged rows in neither side, deletes " +
      "only removed keys, null-safe change detection") {
    val patch = Ops.reconcilePatch(target, replica, Seq("k"))
    val up = patch.upserts.as[(Long, Option[Double], String)]
      .collect().toSet
    val del = patch.deletes.as[Long].collect().toSet
    // 1 (identical) and 6 (null <=> null) must NOT be patched
    assert(up.map(_._1) == Set(2L, 3L, 4L))
    assert(del == Set(5L))
    // upsert rows carry the TARGET values (3's null survives)
    assert(up == Set((2L, Some(20.0), "B2"), (3L, None, "C"),
      (4L, Some(40.0), "D")))
  }

  test("identical frames produce an empty patch") {
    val patch = Ops.reconcilePatch(target, target, Seq("k"))
    assert(patch.upserts.isEmpty && patch.deletes.isEmpty)
  }

  test("schema drift between target and replica is rejected") {
    intercept[IllegalArgumentException] {
      Ops.reconcilePatch(target, replica.withColumnRenamed("price", "p"),
        Seq("k"))
    }
  }
}
