package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge/pair relations (the
  * similarity-pair graphs the dedup family emits, or any (a, b)
  * edge list). Companions to [[Dedup.connectedComponents]] (cluster
  * labeling) and the PageRank query in `queries.Analytics`.
  */
object Graph {

  /** Triangle enumeration via degree-ordered edge orientation — the
    * forward/node-iterator++ algorithm (Schank & Wagner, WEA 2005;
    * the same orientation trick behind Cohen's MapReduce triangle
    * counting): orient every undirected edge from its lower
    * (degree, id) endpoint to the higher, so each triangle has
    * exactly ONE vertex with two out-edges into it and is found
    * exactly once.
    *
    * Why orientation matters at scale: naive wedge generation joins
    * the edge list with itself on the shared vertex, which explodes
    * quadratically on hub nodes (a degree-10⁶ hub yields 10¹²
    * wedges). Under degree orientation every out-degree is bounded
    * by O(√m) regardless of hubs, so the wedge volume is Σ outdeg²
    * ≤ O(m^1.5) worst case and far less on real degree
    * distributions — hubs become wedge SINKS (high order), not
    * wedge centers. All three steps are plain hash-shuffle joins on
    * node ids; nothing is collected or broadcast.
    *
    * Output: one row per triangle, endpoint ids sorted ascending as
    * (x, y, z).
    */
  def triangles(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", canonical: Boolean = false): DataFrame = {
    // canonicalize: undirected, loop-free, deduped on (min, max) —
    // skipped (one full shuffle saved) when the caller vouches the
    // relation is already in that form
    val edges = if (canonical)
      pairs.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
    else pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()
    val deg = edges.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // total order = (degree, id); orientation follows it. Each edge
    // carries its endpoints' order keys so wedge generation and the
    // closing-edge probe never re-join degrees.
    val da = deg.select(col("n").as("a"), struct(col("deg"), col("n")).as("orda"))
    val db = deg.select(col("n").as("b"), struct(col("deg"), col("n")).as("ordb"))
    val oriented = edges.join(da, "a").join(db, "b")
      .select(
        when(col("orda") < col("ordb"),
          struct(col("a").as("src"), col("b").as("dst"),
            col("ordb").as("dstOrd")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"),
            col("orda").as("dstOrd"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dstOrd").as("dstOrd"))
    // wedges at the (unique) low-order vertex: out-neighbor pairs
    // (v, w) with ord(v) < ord(w); the closing edge, if present, is
    // oriented v -> w for exactly that reason.
    val o1 = oriented.select(col("src"), col("dst").as("v"),
      col("dstOrd").as("vOrd"))
    val o2 = oriented.select(col("src"), col("dst").as("w"),
      col("dstOrd").as("wOrd"))
    val wedges = o1.join(o2, "src").filter(col("vOrd") < col("wOrd"))
      .select(col("src"), col("v"), col("w"))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    wedges.join(closing, Seq("v", "w"))
      .select(array_sort(array(col("src"), col("v"), col("w"))).as("t"))
      .select(col("t")(0).as("x"), col("t")(1).as("y"), col("t")(2).as("z"))
  }

  /** Local clustering coefficient per node: 2·T(v) / (deg(v)·(deg(v)−1))
    * — what fraction of a node's neighbour pairs are themselves
    * connected. The community-quality readout over a similarity graph:
    * coefficient ≈ 1 marks a clique-like duplicate community,
    * coefficient ≈ 0 a hub stitching unrelated docs (exactly the node
    * a transitive-closure dedup should distrust). Cost is the
    * [[triangles]] enumeration (orientation-bounded) plus one
    * explode+groupBy over the triangle relation — tiny next to the
    * edge list — and the degree fold; every node of degree ≥ 1 is
    * emitted, with coefficient 0 when degree < 2 (no neighbour pair
    * exists).
    */
  def clusteringCoefficient(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()
    val deg = edges.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val triPerNode = triangles(edges, "a", "b", canonical = true)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L))
            / (col("degree") * (col("degree") - 1)), 4))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007), fixed
    * `rounds`: every node starts as its own label and each round
    * adopts the MODE of its neighbours' previous-round labels (ties →
    * smallest label), all nodes updating together — a pure function
    * of the graph, integers end to end (no modularity randomness).
    * `sym`: symmetric edge list (src, dst). Complements
    * [[graft.operators.Dedup.connectedComponents]]: CC merges anything
    * reachable (one bridge edge fuses two communities), LPA keeps
    * densely-linked groups apart. Per round: one edge⋈label join
    * (labels node-sized, broadcast), a (node, label) count fold, one
    * per-node argmax window; labels checkpointed per round (the
    * pagerank discipline). Returns (node, lab).
    */
  def labelPropagation(sym: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // LAZY checkpoints (r15, the pagerank rationale): each round's
    // broadcast build / the final fold fully materializes the previous
    // label relation, so the eager persist was one extra no-op job per
    // round; lineage truncation is unchanged
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val counted = sym
        .join(broadcast(labels.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst").as("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("node")
        .orderBy(col("c").desc, col("lab"))
      labels = counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("node", "lab")
        .localCheckpoint(false)
    }
    labels
  }
}
