package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK returns exact neighbours in cosine order") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f))).toDF("id", "embedding")
    val queries = corpus.filter(col("id") === 1L)
    val out = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .select("corpus_id", "rank").as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("nearDupPairs finds planted high-cosine pairs only") {
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(1.01f, 2.01f, 3.01f, 4.01f)), // ~copy of 1
      (3L, Array(-4f, 3f, -2f, 1f))).toDF("id", "embedding")
    val out = Similarity.nearDupPairs(vecs, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("lshTopK recalls planted near-duplicates (high-sim regime)") {
    // 40 base vectors (deterministic pseudo-random) + a perturbed copy
    // of each: the copy must appear among the LSH top-k of its original
    // for most originals.
    def pseudo(i: Int, d: Int): Float =
      (((i * 131071 + d * 8191) % 1997).toFloat / 1997f) - 0.5f
    val base = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(16)(d => pseudo(i, d))))
    val copies = base.map { case (id, v) =>
      (id + 1000L, v.zipWithIndex.map { case (x, d) =>
        x + (if (d % 2 == 0) 0.005f else -0.005f) })
    }
    val corpus = (base ++ copies).toDF("id", "embedding")
    val queries = corpus.filter(col("id") < 1000L)
    val out = Similarity.lshTopK(corpus, queries, k = 3,
      numBits = 8, tables = 6)
      .filter(col("corpus_id") === col("query_id") + 1000L)
      .select("query_id").as[Long].collect().toSet
    assert(out.size >= 30, s"LSH recalled only ${out.size}/40 planted pairs")
  }

  test("multiprobe lshTopK never loses recall vs single-probe (candidate " +
      "superset + exact rerank)") {
    // multiprobe only ADDS query-side buckets, and the final ranking is
    // exact cosine over candidates — so recall vs brute force is
    // monotone in nProbes. Measured on the sf0.001 embeddings fixture.
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("corpus_id"))
        .as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(all, q, k = 5))
    def recallAt(p: Int): Double =
      pairs(Similarity.lshTopK(all, q, k = 5, numBits = 8, tables = 6,
        nProbes = p)).intersect(exact).size.toDouble / exact.size
    val r1 = recallAt(1)
    val r8 = recallAt(8)
    assert(r8 >= r1, s"multiprobe lost recall: $r8 < $r1")
    assert(r8 >= 0.6, s"declared tolerance floor violated at sf0.001: $r8")
  }

  test("signBandPairs: non-empty, precision 1.0 vs the exact relation, " +
      "and deterministic across runs") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = toSet(Similarity.nearDupPairs(all, 0.3))
    val banded = toSet(Similarity.signBandPairs(all, 0.3))
    assert(banded.nonEmpty, "band scheme found no candidate pairs")
    // precision 1.0: every emitted pair carries a re-verified exact
    // cosine, so banding can only LOSE pairs, never invent them
    assert(banded.subsetOf(exact),
      s"banded pairs outside the exact relation: ${banded.diff(exact)}")
    // the banding is a pure function of the stored floats — two runs
    // produce the identical relation (what makes it oracle-replayable)
    assert(toSet(Similarity.signBandPairs(all, 0.3)) == banded)
    // wider bands (fewer bits) only ADD candidates: recall is monotone
    val wider = toSet(Similarity.signBandPairs(all, 0.3, bands = 10,
      bits = 4))
    assert(banded.subsetOf(wider) || wider.size >= banded.size)
  }

  test("lshTopK scores agree with brute force on recalled pairs") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.1f, 0f)),
      (3L, Array(0.98f, 0.15f, 0.05f))).toDF("id", "embedding")
    val brute = Similarity.bruteForceTopK(vecs, vecs, k = 2)
      .select("query_id", "corpus_id", "cosine")
      .as[(Long, Long, Double)].collect().toMap2
    val lsh = Similarity.lshTopK(vecs, vecs, k = 2, numBits = 4, tables = 4)
      .select("query_id", "corpus_id", "cosine")
      .as[(Long, Long, Double)].collect()
    lsh.foreach { case (q, c, cos) =>
      assert(brute.get((q, c)).contains(cos),
        s"cosine mismatch for ($q,$c)")
    }
  }

  test("ivfTopK with nProbe == nCells equals brute force exactly") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(all, q, k = 5)
      .orderBy("query_id", "rank").collect()
    val ivfAll = Similarity.ivfTopK(all, q, k = 5, nCells = 8, nProbe = 8)
      .orderBy("query_id", "rank").collect()
    assert(ivfAll.length == exact.length && ivfAll.nonEmpty)
    assert(ivfAll.sameElements(exact))
  }

  test("ivfTopK partial probing keeps usable recall at a fraction of cost") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(all, q, k = 5))
    val ivf = pairs(Similarity.ivfTopK(all, q, k = 5,
      nCells = 8, nProbe = 4))
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, f"recall@5 $recall%.2f below floor")
  }

  test("semDedupPairs: subset of exact pairs with exact cosines; " +
      "nCells=1 degenerates to the exact pair set") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cosine")
        .as[(Long, Long, Double)].collect().toSet
    val exact = rows(Similarity.nearDupPairs(all, threshold = 0.4))
    val blocked = rows(Similarity.semDedupPairs(all, threshold = 0.4,
      nCells = 4))
    // precision 1.0: every blocked pair IS an exact pair, same cosine
    assert(blocked.subsetOf(exact),
      s"non-exact pairs emitted: ${blocked.diff(exact)}")
    // one cell = no blocking = the full exact relation
    val oneCell = rows(Similarity.semDedupPairs(all, threshold = 0.4,
      nCells = 1))
    assert(oneCell == exact)
  }

  test("persisted IVF index: save/load probe equals the in-memory probe, " +
      "layout is cell-partitioned") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
    val fitted = Similarity.ivfFit(all, nCells = 8, cache = false)
    val inMem = Similarity.ivfProbe(fitted, q, k = 5, nProbe = 4)
      .orderBy("query_id", "rank").collect()
    val path = java.nio.file.Files
      .createTempDirectory("simspec_ivf").toString + "/ivf"
    Similarity.ivfSave(fitted, path)
    val loaded = Similarity.ivfLoad(spark, path)
    assert(loaded.nCells == 8)
    // hive layout: one cell=N directory per populated cell
    val dirs = new java.io.File(path + "/assigned")
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell=")), dirs.toSeq)
    val fromDisk = Similarity.ivfProbe(loaded, q, k = 5, nProbe = 4)
      .orderBy("query_id", "rank").collect()
    assert(fromDisk.sameElements(inMem))
  }

  test("assignToCells against frozen centroids reproduces the fit's " +
      "own assignment — streamed appends land in the same cells a " +
      "batch rebuild would choose") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val fitted = Similarity.ivfFit(all, nCells = 8, cache = false)
    val streamed = Similarity.assignToCells(all, fitted.centroids)
      .select(col("corpus_id"), col("cell").as("s_cell"))
    val both = fitted.assigned.join(streamed, "corpus_id")
    assert(both.count() === all.count())
    // tie-tolerant law: a mismatch is legal ONLY where the two cells'
    // exact squared distances are a near-tie (the fit assigns through
    // ivf_cell's float accumulation, assignToCells through zip_with
    // doubles — rounding may break an exact-distance near-tie the
    // other way); any mismatch with a real margin is a genuine
    // divergence. On this fixed fixture the outcome is deterministic.
    val cents = fitted.centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val mismatched = both.filter(col("cell") =!= col("s_cell"))
      .select(col("c_emb").cast("array<double>"), col("cell"),
        col("s_cell")).collect()
    mismatched.foreach { r =>
      val e = r.getSeq[Double](0).toArray
      val n = math.sqrt(e.map(x => x * x).sum)
      val v = if (n == 0) e else e.map(_ / n)
      def d2(c: Array[Double]) =
        v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      val (da, db) = (d2(cents(r.getInt(1))), d2(cents(r.getInt(2))))
      assert(math.abs(da - db) < 1e-9,
        s"non-tie divergence: cells ${r.getInt(1)}/${r.getInt(2)} " +
          s"d2 $da vs $db")
    }
    // and, absent tie-divergences, a probe over the re-assigned index
    // equals the fit's probe result-for-result
    if (mismatched.isEmpty) {
      val q = all.filter(col("id") < 5)
      val viaFit = Similarity.ivfProbe(fitted, q, k = 5, nProbe = 4)
        .orderBy("query_id", "rank").collect()
      val viaAssign = Similarity.ivfProbe(Similarity.IvfIndex(
        Similarity.assignToCells(all, fitted.centroids),
        fitted.centroids, 8), q, k = 5, nProbe = 4)
        .orderBy("query_id", "rank").collect()
      assert(viaAssign.sameElements(viaFit))
    }
  }

  test("sq8TopK with rerank >= |corpus| equals brute force exactly") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(all, q, k = 5)
      .orderBy("query_id", "rank").collect()
    val sq8 = Similarity.sq8TopK(all, q, k = 5, rerank = all.count().toInt)
      .orderBy("query_id", "rank").collect()
    assert(sq8.length == exact.length && sq8.nonEmpty)
    assert(sq8.sameElements(exact))
  }

  test("sq8TopK at practical rerank keeps high recall vs brute force") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(all, q, k = 5))
    val sq8 = pairs(Similarity.sq8TopK(all, q, k = 5, rerank = 25))
    val recall = (exact & sq8).size.toDouble / exact.size
    assert(recall >= 0.9, f"recall@5 $recall%.2f below floor")
  }

  test("pqTopK with rerank >= |corpus| equals brute force exactly") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(all, q, k = 5)
      .orderBy("query_id", "rank").collect()
    val pq = Similarity.pqTopK(all, q, k = 5,
      rerank = all.count().toInt)
      .orderBy("query_id", "rank").collect()
    assert(pq.length == exact.length && pq.nonEmpty)
    assert(pq.sameElements(exact))
  }

  test("pqTopK at practical rerank keeps high recall vs brute force") {
    // sf0.01 (500 vectors): rerank=50 is 10% of the corpus — small
    // enough that the coarse ADC ranking is doing real work (at
    // sf0.001's 50 vectors any rerank is half the corpus and the
    // claim is vacuous). k=32 matches the declared query; its
    // shipping rerank=100 adds safety margin on top of this floor.
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.01",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(all, q, k = 5))
    val pq = pairs(Similarity.pqTopK(all, q, k = 5, m = 16,
      numCentroids = 32, rerank = 50))
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.9, f"recall@5 $recall%.2f below floor")
  }

  test("pq kernels: deterministic codebooks, in-range codes, ADC is the " +
      "table sum") {
    import graft.expressions.Kernels
    def pseudo(i: Int, d: Int): Float =
      (((i * 524287 + d * 2039) % 4001).toFloat / 4001f) - 0.5f
    val vecs = (0 until 64).map(i =>
      Array.tabulate(32)(d => pseudo(i, d))).toArray
    val (m, k) = (8, 16)
    val cb = Kernels.pqTrain(vecs, m, k, iters = 12, seed = 42L)
    assert(cb.length == m * k * (32 / m))
    // deterministic under the seed
    assert(java.util.Arrays.equals(cb,
      Kernels.pqTrain(vecs, m, k, iters = 12, seed = 42L)))
    def ad(v: Array[Float]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(x => x: Any))
    val code = Kernels.pqEncode(ad(vecs(0)), cb, m, k)
    assert(code.length == m && code.forall(c => (c & 0xff) < k))
    val table = Kernels.pqAdcTable(ad(vecs(1)), cb, m, k)
    assert(table.length == m * k)
    val expected = code.zipWithIndex
      .map { case (c, sub) => table(sub * k + (c & 0xff)).toDouble }.sum
    val got = Kernels.pqAdc(ad(table), code)
    assert(math.abs(got - expected) < 1e-9)
    // the all-zero vector encodes without NaN and scores finite
    val zcode = Kernels.pqEncode(ad(Array.fill(32)(0f)), cb, m, k)
    assert(!Kernels.pqAdc(ad(Kernels.pqAdcTable(ad(Array.fill(32)(0f)),
      cb, m, k)), zcode).isNaN)
  }

  test("ivfPq with full probing and rerank >= |corpus| equals brute force " +
      "exactly") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
    val n = all.count().toInt
    val exact = Similarity.bruteForceTopK(all, q, k = 5)
      .orderBy("query_id", "rank").collect()
    val idx = Similarity.ivfPqFit(all, nCells = 4, cache = false)
    val got = Similarity.ivfPqProbe(idx, all, q, k = 5, nProbe = 4,
        rerank = n)
      .orderBy("query_id", "rank").collect()
    assert(got.length == exact.length && got.nonEmpty)
    assert(got.sameElements(exact))
  }

  test("persisted IVF-PQ index: save/load probe equals the in-memory " +
      "probe and the code table holds no embeddings") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
    val idx = Similarity.ivfPqFit(all, nCells = 4, cache = false)
    val inMem = Similarity.ivfPqProbe(idx, all, q, k = 5, nProbe = 2,
      rerank = 20).orderBy("query_id", "rank").collect()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq").toString + "/idx"
    Similarity.ivfPqSave(idx, dir)
    val loaded = Similarity.ivfPqLoad(spark, dir)
    assert(loaded.nCells == idx.nCells && loaded.cb.m == idx.cb.m
      && loaded.cb.k == idx.cb.k)
    assert(java.util.Arrays.equals(loaded.cb.flat, idx.cb.flat))
    // the persisted code table carries ids, cells, codes — nothing else
    assert(loaded.assigned.columns.sorted.toSeq ==
      Seq("cell", "code", "corpus_id"))
    val fromDisk = Similarity.ivfPqProbe(loaded, all, q, k = 5,
      nProbe = 2, rerank = 20).orderBy("query_id", "rank").collect()
    assert(fromDisk.sameElements(inMem))
  }

  test("ivfPq partial probing tracks flat IVF recall at the same nProbe") {
    val all = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(all, q, k = 5))
    val ivf = pairs(Similarity.ivfTopK(all, q, k = 5, nCells = 4,
      nProbe = 2))
    val idx = Similarity.ivfPqFit(all, nCells = 4, cache = false)
    val ivfpq = pairs(Similarity.ivfPqProbe(idx, all, q, k = 5,
      nProbe = 2, rerank = all.count().toInt))
    // with rerank >= the probed volume, the ONLY loss is cell pruning,
    // which is identical (same quantizer seed) — so recall matches
    val rIvf = (exact & ivf).size.toDouble / exact.size
    val rPq = (exact & ivfpq).size.toDouble / exact.size
    assert(rPq >= rIvf - 1e-9,
      f"ivfpq recall $rPq%.2f below flat ivf $rIvf%.2f")
  }

  test("sq8 quantization: codes span int8, cosine error is small") {
    import graft.expressions.Kernels
    def pseudo(i: Int, d: Int): Float =
      (((i * 524287 + d * 2039) % 4001).toFloat / 4001f) - 0.5f
    val vecs = (0 until 50).map(i => Array.tabulate(32)(d => pseudo(i, d)))
    def ad(v: Array[Float]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(x => x: Any))
    // all-zero stays all-zero, not NaN
    assert(Kernels.sq8Cosine(Kernels.sq8Quantize(ad(Array.fill(8)(0f))),
      Kernels.sq8Quantize(ad(vecs.head))) == 0.0)
    for (a <- vecs.take(10); b <- vecs.take(10)) {
      val qa = Kernels.sq8Quantize(ad(a))
      val qb = Kernels.sq8Quantize(ad(b))
      assert(qa.forall(c => c >= -127 && c <= 127))
      val approx = Kernels.sq8Cosine(qa, qb)
      val exact = Kernels.cosineF(ad(a), ad(b))
      assert(math.abs(approx - exact) < 0.02,
        f"|sq8 - exact| = ${math.abs(approx - exact)}%.4f")
    }
  }

  implicit private class MapOps(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }

  test("d_hybrid_rrf: fused score is exactly the rank-reciprocal sum") {
    val out = SparkEntry.queries("d_hybrid_rrf")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val vec = Option(r.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
      assert(lex.nonEmpty || vec.nonEmpty, "doc in neither leg")
      (lex.toSeq ++ vec.toSeq).foreach(x => assert(x >= 1 && x <= 20))
      val expected = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expected,
        s"rrf not the exact reciprocal sum for $r")
    }
    // the query embedding's own doc tops the vector leg (cosine 1.0)
    val self = out.find(_.getAs[Long]("doc_id") == 7L)
    assert(self.exists(r => r.getAs[java.lang.Long]("vec_rank") == 1L))
    // presented in descending fused order
    val scores = out.map(_.getAs[Double]("rrf")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("mmrRerank: exact duplicates never double-picked; λ=1 is top-k") {
    // query along e1; two IDENTICAL candidates on e1, one orthogonal,
    // one near-query. Pure relevance top-3 = both duplicates + near.
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f)), // exact duplicate of 1
      (3L, Array(0f, 1f, 0f)), // orthogonal
      (10L, Array(0.9f, 0.1f, 0f))).toDF("id", "embedding")
    val queries = Seq((0L, Array(1f, 0f, 0f))).toDF("id", "embedding")
    def picks(lambda: Double): Seq[Long] =
      Similarity.mmrRerank(corpus, queries, topN = 4, k = 3,
        lambda = lambda)
        .orderBy("sel_rank").select("doc_id")
        .as[Long].collect().toSeq
    // λ=1: diversity term off — degenerates to relevance top-k, the
    // duplicate pair fills two slots
    assert(picks(1.0) == Seq(1L, 2L, 10L))
    // λ=0.3: after picking 1, its exact duplicate scores
    // 0.3·1 − 0.7·1 = −0.4, below the orthogonal's 0.0 and the
    // near-query's ~−0.398 — coverage wins the remaining slots
    assert(picks(0.3) == Seq(1L, 3L, 10L))
  }
}
