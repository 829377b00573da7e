package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Ivm

/** The join-delta identity is a MULTISET law — duplicate keys multiply
  * matches, so the spec compares sorted row sequences, not sets.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Int, String, String)] =
    df.select("k", "a", "b").as[(Int, String, String)]
      .collect().toSeq.sorted

  test("view ∪ joinDelta equals the recomputed join, duplicates included") {
    // duplicate keys on BOTH sides (1 appears twice in A-old and the
    // B-delta adds another 1) — the multiplicity-sensitive case
    val aOld = Seq((1, "a1"), (1, "a1b"), (2, "a2")).toDF("k", "a")
    val dA = Seq((2, "a2new"), (3, "a3")).toDF("k", "a")
    val bOld = Seq((1, "b1"), (2, "b2")).toDF("k", "b")
    val dB = Seq((1, "b1new"), (3, "b3")).toDF("k", "b")
    val v0 = aOld.join(bOld, Seq("k"))
    val maintained = v0.unionByName(
      Ivm.joinDelta(aOld, dA, bOld, dB, Seq("k")))
    val recomputed = aOld.unionByName(dA)
      .join(bOld.unionByName(dB), Seq("k"))
    assert(rows(maintained) == rows(recomputed))
    // and the maintenance work really was delta-bounded: the appended
    // frame is the three delta terms only
    val delta = Ivm.joinDelta(aOld, dA, bOld, dB, Seq("k"))
    assert(delta.count() == recomputed.count() - v0.count())
  }

  test("applySigned: update = retract + insert; delete = retract; " +
      "duplicates keep their multiplicity") {
    import org.apache.spark.sql.functions.lit
    // view holds (1,'a') TWICE — multiset
    val view = Seq((1, "a"), (1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val delta = Seq(
      (1, "a", -1L),            // retract ONE of the two duplicates
      (2, "b", -1L), (2, "B", 1L), // update
      (3, "c", -1L),            // delete
      (4, "d", 1L)              // insert
    ).toDF("k", "v", "sign")
    val got = Ivm.applySigned(view, delta)
      .as[(Int, String)].collect().toSeq.sorted
    assert(got == Seq((1, "a"), (2, "B"), (4, "d")))
  }

  test("applySigned: retracting a row the view never held fails loudly") {
    val view = Seq((1, "a")).toDF("k", "v")
    val delta = Seq((9, "zz", -1L)).toDF("k", "v", "sign")
    val e = intercept[Exception] {
      Ivm.applySigned(view, delta).collect()
    }
    assert(e.getMessage != null)
  }

  test("signed join maintenance: retracting a base row removes its " +
      "join contributions") {
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "a")
    val b = Seq((1, "b1"), (1, "b1x"), (2, "b2")).toDF("k", "b")
    val view = a.join(b, Seq("k"))
    // retract a-row (1,'a1'): its join contribution is (1,'a1')⋈B
    import org.apache.spark.sql.functions.lit
    val retract = Seq((1, "a1")).toDF("k", "a")
      .join(b, Seq("k")).withColumn("sign", lit(-1L))
    val got = Ivm.applySigned(view, retract)
      .as[(Int, String, String)].collect().toSeq.sorted
    val expect = a.filter($"a" =!= "a1").join(b, Seq("k"))
      .as[(Int, String, String)].collect().toSeq.sorted
    assert(got == expect)
  }

  test("empty deltas append nothing") {
    val a = Seq((1, "a")).toDF("k", "a")
    val b = Seq((1, "b")).toDF("k", "b")
    val none = a.limit(0)
    val noneB = b.limit(0)
    assert(Ivm.joinDelta(a, none, b, noneB, Seq("k")).count() == 0)
  }
}
