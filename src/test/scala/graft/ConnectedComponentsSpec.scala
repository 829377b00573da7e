package graft

import graft.operators.Dedup

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIter: Int = 25) =
    Dedup.connectedComponents(
      pairs.toDF("id_a", "id_b"), "id_a", "id_b", maxIter)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("two disjoint components get their own min labels") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (10L, 11L))) ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("a chain collapses transitively even when ends never matched") {
    // 5~4, 4~3, 3~2, 2~1: 5 and 1 share no pair but one cluster
    assert(cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))) ==
      (1L to 5L).map(i => (i, 1L)))
  }

  test("a star converges in one hop regardless of id order") {
    assert(cc(Seq((7L, 3L), (7L, 9L), (7L, 5L), (7L, 12L))) ==
      Seq((3L, 3L), (5L, 3L), (7L, 3L), (9L, 3L), (12L, 3L)))
  }

  test("maxIter too small for the diameter fails loudly, not wrongly") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] { cc(chain, maxIter = 2) }
    assert(e.getMessage.contains("no fixpoint"))
    // and with enough rounds the same chain converges: min-label
    // propagation doubles reach per round, so 40 vertices need ~log2
    assert(cc(chain, maxIter = 25) == (1L to 40L).map(i => (i, 1L)))
  }
}
