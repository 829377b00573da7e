package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  test("hashBucket is positional-independent and in range") {
    def buckets(parts: Int): Seq[(Long, Long)] =
      docs.repartition(parts)
        .select(col("doc_id"),
          Curation.hashBucket(col("doc_id"), "s", 100).as("b"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val a = buckets(1)
    assert(a == buckets(7), "bucket must not depend on partitioning")
    assert(a.forall { case (_, b) => b >= 0 && b < 100 })
    // different salts decorrelate: assignments must not be identical
    val other = docs.select(col("doc_id"),
      Curation.hashBucket(col("doc_id"), "t", 100).as("b"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a != other, "independent salts must give independent buckets")
  }

  test("splitAssign covers every row, roughly at the declared weights") {
    val split = docs.withColumn("s", Curation.splitAssign(col("doc_id"),
      "split-v1", Seq("train" -> 80, "val" -> 10, "test" -> 10)))
    val byS = split.groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test"))
    val n = byS.values.sum
    assert(n == docs.count())
    // 500 docs: binomial(500, .8) is within ±6 sigma of these bounds
    assert(byS("train") > n * 0.65 && byS("train") < n * 0.92,
      s"train fraction off: $byS")
  }

  test("weightedSampleKey: positional-independent, and min-k selection " +
      "biases toward heavy weights") {
    val keyed = docs.filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        Curation.weightedSampleKey(col("doc_id"),
          col("n_chars").cast("double"), "s").as("k"))
    def sample(parts: Int): Seq[Long] =
      keyed.repartition(parts)
        .orderBy(col("k"), col("doc_id")).limit(100)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val a = sample(1)
    assert(a == sample(7), "sample must not depend on partitioning")
    // P(selected) ∝ n_chars: the length-weighted sample must be longer
    // on average than the corpus
    val corpusMean = docs.agg(avg("n_chars")).as[Double].head()
    val sampleMean = keyed.orderBy(col("k"), col("doc_id")).limit(100)
      .agg(avg("n_chars")).as[Double].head()
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean vs corpus $corpusMean")
    // independent salts give different samples
    val b = docs.filter(col("n_chars") > 0)
      .select(col("doc_id"), Curation.weightedSampleKey(col("doc_id"),
        col("n_chars").cast("double"), "t").as("k"))
      .orderBy(col("k"), col("doc_id")).limit(100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a != b, "independent salts must draw independent samples")
  }

  test("splitAssign rejects weights that don't sum to 100") {
    intercept[IllegalArgumentException] {
      Curation.splitAssign(col("doc_id"), "s", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("capPerGroup keeps at most n best-first rows per group") {
    val capped = Curation.capPerGroup(docs, col("source"),
      Seq(col("n_chars").desc, col("doc_id").asc), n = 10)
    val sizes = capped.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(sizes.values.forall(_ <= 10))
    // best-first: the minimum kept n_chars per source must be >= the
    // 10th-largest n_chars of that source in the full corpus
    val kept = capped.groupBy("source").agg(min("n_chars").as("kmin"))
    val tenth = docs.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") === 10).select(col("source"), col("n_chars").as("t"))
    val bad = kept.join(tenth, "source").filter(col("kmin") < col("t"))
    assert(bad.isEmpty, "capPerGroup dropped a better row than it kept")
  }

  test("uniformMixture keeps NULL-group rows and samples them like any group") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "a" else null))
      .toDF("id", "src")
    val mixed = Curation.uniformMixture(df, col("src"), col("id"), "m")
    val bySrc = mixed.groupBy("src").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // floor = 10 (the null group); null rows must survive (rate ~1)
    assert(bySrc.getOrElse(None, 0L) >= 7,
      s"null group must not be dropped: $bySrc")
    assert(bySrc.getOrElse(Some("a"), 0L) <= 20,
      s"'a' must downsample toward the floor: $bySrc")
  }

  test("bloom membership: no false negatives, fpp-bounded positives") {
    import graft.functions.GraftFunctions.{bloom_agg, bloom_might_contain}
    val vals = (1L to 5000L).map(i => s"term-$i").toDF("t")
    val sketch = vals.agg(bloom_agg(col("t"), 5000L, 150000L).as("bf"))
      .head.getAs[Array[Byte]](0)
    // every inserted value must probe true
    assert(vals.filter(!bloom_might_contain(sketch, col("t"))).isEmpty)
    // disjoint values: false-positive count far under 1% of 5000 at
    // 30 bits/item (expected ~0; allow a loose 10)
    val fp = (1L to 5000L).map(i => s"other-$i").toDF("t")
      .filter(bloom_might_contain(sketch, col("t"))).count()
    assert(fp <= 10, s"implausible bloom false-positive count $fp")
  }

  test("bloom decontamination is a superset of the exact twin") {
    def flagged(name: String) =
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .select(col("doc_id").cast("long"), col("split"))
        .as[(Long, String)].collect().toSet
    val exact = flagged("d_decontaminate")
    val bloom = flagged("d_decontaminate_bloom")
    assert(exact.subsetOf(bloom),
      s"bloom lost contaminated docs: ${exact.diff(bloom)}")
    assert(bloom.diff(exact).size <= 2,
      s"too many bloom false-positive docs: ${bloom.diff(exact)}")
  }

  test("uniformMixture: deterministic subset, groups near the floor size") {
    val mixed = Curation.uniformMixture(docs, col("source"), col("doc_id"),
      salt = "mix-v1")
    val again = Curation.uniformMixture(docs, col("source"), col("doc_id"),
      salt = "mix-v1")
    assert(mixed.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq,
      "sampling must be reproducible")
    assert(mixed.columns.toSeq == docs.columns.toSeq,
      "helper columns must not leak")
    val before = docs.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    val after = mixed.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    val floor = before.values.min
    // expectation per group is exactly `floor`; allow binomial spread
    assert(after.values.forall(c => c <= floor + 8 && c >= floor - 12),
      s"rebalanced sizes too far from floor=$floor: $after")
    // the smallest group must survive (its rate is ~1)
    val minSrc = before.minBy(_._2)._1
    assert(after(minSrc) >= floor - 4)
  }

  test("d_global_shuffle is a true permutation: every doc exactly " +
      "once, contiguous positions per shard, repartition-stable") {
    val q = SparkEntry.queries("d_global_shuffle")
    val out = q(spark, "/root/testdata/sf0.01")
      .select("shard", "pos", "doc_id").as[(Long, Int, Long)].collect()
    val n = docs.count()
    assert(out.length == n, "every document appears exactly once")
    assert(out.map(_._3).distinct.length == n, "no doc_id repeats")
    // positions within each shard are exactly 1..size (no gaps/dupes)
    out.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"shard $s positions must be contiguous from 1") }
    // the permutation is a pure function of (salt, doc_id): running it
    // again (fresh plan, different partitioning upstream) is identical
    val again = q(spark, "/root/testdata/sf0.01")
      .repartition(7).orderBy("shard", "pos")
      .select("shard", "pos", "doc_id").as[(Long, Int, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("length buckets: every doc fits its cap, caps are minimal " +
      "powers of two, padding arithmetic is consistent") {
    val rows = SparkEntry.queries("d_length_buckets")(
      spark, "/root/testdata/sf0.01")
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cap, nDocs, sumTok, pad) =>
      assert((cap & (cap - 1)) == 0, s"cap $cap must be a power of two")
      assert(pad == nDocs * cap - sumTok, "padding identity")
      assert(pad >= 0, "no doc may exceed its bucket cap")
    }
    // minimality of assignment: recompute the smallest fitting cap per
    // doc independently and compare the whole distribution
    val expected = docs
      .select(graft.functions.TextAnalysis.tokenCount(col("text"))
        .as("n")).as[Long].collect()
      .groupBy(n => Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L,
        4096L).find(_ >= n).getOrElse(4096L))
      .view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r._1.toLong -> r._2).toMap == expected,
      "bucket sizes must match an independent per-doc recomputation")
    assert(rows.map(_._2).sum == docs.count(), "every doc is bucketed")
  }

  test("temperatureMixture keeps ~sqrt-proportional shares on planted " +
      "skew and is deterministic") {
    // 100 / 400 / 900 rows → sqrt ratios 1 : 2 : 3 → expected keeps
    // ~100 : 200 : 300 (smallest group keeps all)
    val rows = (1 to 100).map(i => (s"a$i", "small")) ++
      (1 to 400).map(i => (s"b$i", "mid")) ++
      (1 to 900).map(i => (s"c$i", "big"))
    val df = rows.toDF("id", "grp")
    val kept = Curation.temperatureMixture(df, col("grp"), col("id"), "t1")
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 100, "smallest group must keep everything")
    // binomial spread around 200 and 300 (sd ≈ 13 and 14): allow 4σ
    assert(math.abs(kept("mid") - 200L) <= 55, s"mid kept ${kept("mid")}")
    assert(math.abs(kept("big") - 300L) <= 60, s"big kept ${kept("big")}")
    // pure function of (salt, key): rerun identical, new salt differs
    val again = Curation.temperatureMixture(df, col("grp"), col("id"), "t1")
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(again == kept)
    val other = Curation.temperatureMixture(df, col("grp"), col("id"), "t2")
      .select("id").as[String].collect().toSet
    val first = Curation.temperatureMixture(df, col("grp"), col("id"), "t1")
      .select("id").as[String].collect().toSet
    assert(other != first, "a different salt must pick a different set")
  }

  test("shardByBytes two-phase offsets equal the naive global cumsum; " +
      "shard overshoot is bounded by one row") {
    import org.apache.spark.sql.expressions.Window
    // sparse, unordered ids and wildly uneven sizes — the shapes that
    // break per-bucket bookkeeping if offsets are off by one row
    val rows = Seq(3L -> 10L, 7L -> 500L, 64L -> 1L, 65L -> 9999L,
      130L -> 300L, 131L -> 1L, 132L -> 1L, 999L -> 2048L, 1000L -> 7L)
    val df = rows.toDF("doc_id", "bytes")
    val budget = 1024L
    val got = Curation.shardByBytes(df, "doc_id", col("bytes"),
      budget, bucketSize = 64L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    // naive oracle: single global window (fine at 9 rows)
    val naive = df.withColumn("start",
        coalesce(sum("bytes").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), expr(s"start div $budget").as("shard_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == naive, s"two-phase $got != naive $naive")
    // no helper-column leakage
    assert(Curation.shardByBytes(df, "doc_id", col("bytes"), budget)
      .columns.toSeq == Seq("doc_id", "bytes", "shard_id"))
    // each shard's bytes ≤ budget + its largest row (rows never split)
    val stats = Curation.shardByBytes(df, "doc_id", col("bytes"),
        budget, bucketSize = 64L)
      .groupBy("shard_id")
      .agg(sum("bytes").as("b"), max("bytes").as("m"))
      .as[(Long, Long, Long)].collect()
    stats.foreach { case (sid, b, m) =>
      assert(b <= budget + m, s"shard $sid overshoots: $b > $budget + $m") }
  }

  test("d_ngram_novelty: first doc is fully novel, scores bounded, " +
    "gram occurrences conserved") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("d_ngram_novelty")(spark, sf)
      .select("doc_id", "n_grams", "n_novel", "novelty_e4")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val first = out.minBy(_._1)
    assert(first._3 === first._2 && first._4 === 10000L,
      "the earliest doc's grams are all first occurrences")
    out.foreach { case (id, g, n, e4) =>
      assert(n >= 0 && n <= g, s"doc $id novel outside [0, n_grams]")
      assert(e4 === n * 10000L / g, s"doc $id score arithmetic")
    }
    // every gram occurrence is novel in exactly one doc's ledger:
    // Σ n_novel = number of DISTINCT grams corpus-wide... no — novelty
    // counts OCCURRENCES in the first doc, so Σ n_novel counts each
    // distinct gram's occurrences within its first doc only; bound it
    assert(out.map(_._3).sum <= out.map(_._2).sum)
  }

  test("d_quota_alloc: quotas sum exactly to the budget and respect " +
    "weight order") {
    val out = SparkEntry.queries("d_quota_alloc")(
      spark, "/root/testdata/sf0.001")
      .select("source", "weight", "quota")
      .as[(String, Long, Long)].collect()
    assert(out.map(_._3).sum === 997L, "largest-remainder must hit N")
    // apportionment monotonicity: a strictly larger weight never
    // receives a smaller quota
    for (a <- out; b <- out if a._2 > b._2)
      assert(a._3 >= b._3, s"${a._1} (${a._2}) < ${b._1} (${b._2})")
    // quota within one slot of the unrounded proportional share
    val tw = out.map(_._2).sum
    out.foreach { case (s, w, q) =>
      val exact = 997.0 * w / tw
      assert(q >= exact - 1 && q <= exact + 1, s"$s: $q vs $exact")
    }
  }

  test("contrastiveBatches: one slot per cluster per batch, overflow " +
    "dropped, singletons spread") {
    import spark.implicits._
    // one oversized cluster (20 members, cluster id 100) + 8 singletons
    val members = ((0L until 20L).map(i => (1000L + i, 100L)) ++
      (0L until 8L).map(i => (i, i))).toDF("id", "cluster")
    val out = Curation.contrastiveBatches(members, nBatches = 16)
    // cap: the 20-member cluster keeps exactly 16 (one per batch)
    assert(out.count() === 16 + 8)
    val perBatchCluster = out.groupBy("batch", "cluster").count()
      .agg(max("count")).head.getLong(0)
    assert(perBatchCluster === 1L, "a cluster repeated within a batch")
    val clusterBatches = out.filter(col("cluster") === 100L)
      .select("batch").as[Long].collect().toSet
    assert(clusterBatches.size === 16, "capped cluster must cover all batches")
    // determinism: same input, same assignment
    val again = Curation.contrastiveBatches(members, nBatches = 16)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }
}
