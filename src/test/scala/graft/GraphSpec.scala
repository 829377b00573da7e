package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    Graph.triangles(edges.toDF("id_a", "id_b"))
      .as[(Long, Long, Long)].collect().sorted.toSeq

  test("triangles: K4 has 4, a star has 0, a path has 0") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(tri(k4) == Seq((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L),
      (1L, 2L, 3L)))
    assert(tri(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))).isEmpty)
    assert(tri(Seq((0L, 1L), (1L, 2L), (2L, 3L))).isEmpty)
  }

  test("triangles: triangle + pendant found once; direction/dup/loop " +
      "noise in the input is canonicalized away") {
    val noisy = Seq(
      (1L, 2L), (2L, 1L),          // both orientations of one edge
      (2L, 3L), (3L, 1L),
      (1L, 1L),                    // self loop
      (3L, 3L),
      (3L, 4L), (3L, 4L))          // pendant, duplicated
    assert(tri(noisy) == Seq((1L, 2L, 3L)))
  }

  test("clusteringCoefficient: clique nodes are 1, leaves and stars 0, " +
      "the hub of triangle+pendant is 1/3") {
    val k4 = (for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b))
      .toDF("id_a", "id_b")
    val k4out = Graph.clusteringCoefficient(k4)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(k4out == (0L to 3L).map(n => (n, 3L, 3L, 1.0)))
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("id_a", "id_b")
    assert(Graph.clusteringCoefficient(star)
      .as[(Long, Long, Long, Double)].collect()
      .forall { case (_, _, t, c) => t == 0L && c == 0.0 })
    val triPendant = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("id_a", "id_b")
    val tp = Graph.clusteringCoefficient(triPendant)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(tp == Seq((1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.3333), (4L, 1L, 0L, 0.0)))
  }

  test("triangles: agrees with the naive three-way join on the fixture " +
      "near-dup graph") {
    val pairs = graft.operators.Similarity.nearDupPairs(
      graft.queries.Tables(spark, "/root/testdata/sf0.001", "embeddings")
        .select(col("vec_id").as("id"), col("embedding")),
      threshold = 0.2).select("id_a", "id_b").cache()
    val p1 = pairs.select(col("id_a").as("x"), col("id_b").as("y"))
    val p2 = pairs.select(col("id_a").as("y"), col("id_b").as("z"))
    val p3 = pairs.select(col("id_a").as("x"), col("id_b").as("z"))
    val naive = p1.join(p2, "y").join(p3, Seq("x", "z"))
      .select("x", "y", "z").as[(Long, Long, Long)].collect().sorted.toSeq
    val fast = Graph.triangles(pairs)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    pairs.unpersist()
    assert(naive.nonEmpty, "fixture graph should contain triangles")
    assert(fast == naive)
  }

  test("labelPropagation separates bridged cliques that CC would merge") {
    // two 4-cliques {0..3} and {10..13} joined by ONE bridge edge 3-10
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val undirected = clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((3L, 10L))
    val sym = (undirected ++ undirected.map(_.swap))
      .toDF("src", "dst")
    val labs = Graph.labelPropagation(sym, rounds = 4)
      .as[(Long, Long)].collect().toMap
    // every clique converges to its min member's label...
    assert(Seq(0L, 1L, 2L, 3L).forall(labs(_) == 0L))
    assert(Seq(10L, 11L, 12L, 13L).forall(labs(_) == 10L))
    // ...while connected components would fuse all 8 across the bridge
    val cc = graft.operators.Dedup.connectedComponents(
      undirected.toDF("id_a", "id_b"), "id_a", "id_b")
      .select("cluster").distinct().as[Long].collect().toSeq
    assert(cc == Seq(0L))
  }

  test("labelPropagation is deterministic and label-closed") {
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (4L, 5L), (5L, 4L)).toDF("src", "dst")
    val a = Graph.labelPropagation(sym, 3).as[(Long, Long)].collect().toSet
    val b = Graph.labelPropagation(sym, 3).as[(Long, Long)].collect().toSet
    assert(a == b)
    // labels are always node ids from the graph itself
    val nodes = Set(1L, 2L, 3L, 4L, 5L)
    assert(a.forall { case (n, l) => nodes(n) && nodes(l) })
    assert(a.map(_._1) == nodes)
  }
}
