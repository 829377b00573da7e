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

  test("property: apply ∘ reconcile == target over generated drifted " +
      "tables (nullable values, disjoint and overlapping keys)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen: Gen[(Long, Option[Double], String)] = for {
      k <- Gen.choose(0L, 25L)
      p <- Gen.option(Gen.choose(0, 500).map(_ / 10.0))
      s <- Gen.oneOf("A", "B", "C")
    } yield (k, p, s)
    val tableGen = Gen.listOf(rowGen)
      .map(_.groupBy(_._1).map(_._2.head).toList) // unique keys
    def sample(i: Long) =
      tableGen.pureApply(Gen.Parameters.default.withSize(30), Seed(i))
    for (i <- 1 to 8) {
      val t = sample(i)
      val r = sample(i + 500)
      val tDf = t.toDF("k", "price", "status")
      val rDf = r.toDF("k", "price", "status")
      val patch = Ops.reconcilePatch(tDf, rDf, Seq("k"))
      val repaired = Ops.applyPatch(rDf, patch, Seq("k"))
        .as[(Long, Option[Double], String)].collect().toSet
      assert(repaired == t.toSet, s"trial $i")
      // minimality: no row of the patch is an unchanged row
      val unchanged = t.toSet & r.toSet
      val up = patch.upserts.as[(Long, Option[Double], String)]
        .collect().toSet
      assert((up & unchanged).isEmpty, s"trial $i non-minimal")
    }
  }
}
