package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.word_ngrams
import graft.functions.TextAnalysis
import graft.operators.{Curation => Cur, Ops}

/** Corpus-curation declared queries ([[graft.operators.Curation]]):
  * deterministic split assignment, per-domain caps, and mixture
  * rebalancing over the `documents` table. All three sit under the
  * EXACT DuckDB oracle — the bucket hash is md5, computed identically
  * by both engines (`conv(substr(md5(x),1,8),16,10)` ≡
  * `CAST('0x' || substr(md5(x),1,8) AS BIGINT)`), so even the sampling
  * decisions hash-compare, not just the aggregate shapes.
  */
object Curation {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Oracle fragment: the same 32-bit salted md5 bucket Spark computes. */
  private def bucketSql(salt: String, buckets: Int): String =
    s"CAST(('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 8)) " +
      s"AS BIGINT) % $buckets"

  /** Deterministic 80/10/10 train/val/test assignment keyed on doc_id:
    * the split a document lands in is a pure function of (salt, key) —
    * rerunning, repartitioning, or scaling the cluster can't move a
    * document across the split boundary (the property a training
    * pipeline needs to keep eval data out of training). Reported as
    * per-(split, lang) corpus stats.
    */
  private def splitAssign(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("split", Cur.splitAssign(col("doc_id"), "split-v1",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("split", "lang")

  private val splitAssignSql =
    s"""WITH b AS (
       |  SELECT lang, n_chars, ${bucketSql("split-v1", 100)} AS bucket
       |  FROM documents)
       |SELECT CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'val'
       |            ELSE 'test' END AS split,
       |  lang, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  /** Per-domain contribution cap: each source contributes at most its
    * 10 longest documents (doc_id tiebreak), the anti-domination gate a
    * mixture pipeline applies before token budgeting. One keyed window
    * shuffle; reported per source.
    */
  private def domainCap(spark: SparkSession, dir: String): DataFrame =
    Cur.capPerGroup(docs(spark, dir), col("source"),
      Seq(col("n_chars").desc, col("doc_id").asc), n = 10)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
        min("n_chars").as("min_chars"))
      .orderBy("source")

  private val domainCapSql =
    """WITH ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(n_chars) AS min_chars
      |FROM ranked WHERE rn <= 10
      |GROUP BY source ORDER BY source""".stripMargin

  /** Uniform-mixture rebalance: every source deterministically
    * downsampled toward the smallest source's size
    * (`bucket * n_src < n_min * 10000` — integer arithmetic, exactly
    * reproducible). The per-source counts are a tiny broadcast; the
    * fact side never shuffles. Reported per source with the exact and
    * achieved sizes side by side.
    */
  private def mixUniform(spark: SparkSession, dir: String): DataFrame =
    Cur.uniformMixture(docs(spark, dir), col("source"), col("doc_id"),
      salt = "mix-v1")
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"), sum("n_chars").as("total_chars"))
      .orderBy("source")

  private val mixUniformSql =
    s"""WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
       |m AS (SELECT min(n_src) AS n_min FROM c),
       |b AS (
       |  SELECT d.source, d.n_chars, c.n_src, m.n_min,
       |    ${bucketSql("mix-v1", 10000)} AS bucket
       |  FROM documents d JOIN c USING (source) CROSS JOIN m)
       |SELECT source, count(*) AS n_sampled,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM b WHERE bucket * n_src < n_min * 10000
       |GROUP BY source ORDER BY source""".stripMargin

  /** Temperature-flattened mixture (α = 0.5, "square-root sampling"):
    * big domains downsample toward √-proportional shares — the
    * multilingual/multidomain rebalance between uniform (α = 0) and
    * natural (α = 1). Keep rule: `bucket < floor((10000·√n_min)/√n_d)`
    * — the smallest domain keeps everything, a domain 100× larger
    * keeps 10%. α is FIXED at 0.5 deliberately: √, ×, ÷ are IEEE
    * correctly-rounded in both engines so the decision is
    * bit-identical, while a general pow(n, α) is libm-dependent and
    * would flip boundary docs across engines. Same broadcast shape as
    * [[mixUniform]]: tiny per-domain counts come back as a broadcast,
    * the fact side filters without shuffling.
    */
  private def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val c = docs(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("n_src"))
    Cur.temperatureMixture(docs(spark, dir), col("source"), col("doc_id"),
      salt = "mixt-v1")
      .join(broadcast(c), "source")
      .groupBy("source")
      .agg(max("n_src").as("n_src"), count(lit(1)).as("n_sampled"),
        sum("n_chars").as("total_chars"))
      .orderBy("source")
  }

  private val mixTemperatureSql =
    s"""WITH c AS (SELECT source, count(*) AS n_src
       |  FROM documents GROUP BY 1),
       |m AS (SELECT min(n_src) AS n_min FROM c),
       |b AS (
       |  SELECT d.source, d.n_chars, c.n_src,
       |    floor((10000.0 * sqrt(m.n_min)) / sqrt(c.n_src)) AS thr,
       |    ${bucketSql("mixt-v1", 10000)} AS bucket
       |  FROM documents d JOIN c USING (source) CROSS JOIN m)
       |SELECT source, max(n_src) AS n_src, count(*) AS n_sampled,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM b WHERE bucket < thr
       |GROUP BY source ORDER BY source""".stripMargin

  /** Decontamination — the eval-leakage check every training pipeline
    * runs before shipping a split: an eval (val/test) document is
    * contaminated if it shares any exact word 5-gram with any TRAIN
    * document. Reuses the same deterministic split as `d_split_assign`
    * (same salt ⇒ same assignment) and the codegen'd
    * [[graft.expressions.WordNGrams]] shingles. Shape at scale: ONE
    * corpus pass, one gram-keyed shuffle (train presence is a partial
    * count, eval docs a per-gram list — strictly cheaper than the
    * train⋈eval gram self-join, which re-scans the corpus and goes
    * quadratic on hot grams), one final doc-keyed count. (At 100 TB a
    * boilerplate-gram cap / bloom prefilter wraps this exact core.)
    */
  private def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val grams = Ops.spreadNarrow(docs(spark, dir))
      .withColumn("split", Cur.splitAssign(col("doc_id"), "split-v1",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .select(col("doc_id"), col("split"),
        explode(word_ngrams(col("text"), 5)).as("g"))
    grams.groupBy("g")
      .agg(count(when(col("split") === "train", 1)).as("n_train"),
        collect_list(when(col("split") =!= "train",
          struct(col("doc_id"), col("split")))).as("evals"))
      .filter(col("n_train") > 0 && size(col("evals")) > 0)
      .select(explode(col("evals")).as("e"))
      .select(col("e.doc_id").as("doc_id"), col("e.split").as("split"))
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  private val decontaminateSql =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)),
       |    '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 3),
       |    i -> array_to_string(t[i:i+4], ' '))) AS gs
       |  FROM toks WHERE len(t) >= 5),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN ${bucketSql("split-v1", 100)} < 80 THEN 'train'
       |         WHEN ${bucketSql("split-v1", 100)} < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |exploded AS (
       |  SELECT g.doc_id, s.split, u.g
       |  FROM grams g JOIN sp s USING (doc_id), unnest(g.gs) AS u(g)),
       |train_g AS (SELECT DISTINCT g FROM exploded WHERE split = 'train')
       |SELECT e.doc_id, e.split, count(*) AS n_shared_grams
       |FROM exploded e JOIN train_g t ON e.g = t.g
       |WHERE e.split <> 'train'
       |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** The promised SCALE PATH of [[decontaminate]]: the train-gram set
    * folds into ONE bloom sketch (Spark's own `BloomFilterAggregate`,
    * ~30 bits/gram → fpp ≈ 1e-6) collected to the driver (KBs–MBs,
    * bounded by construction like the LSH/IVF centroid sets) and the
    * eval side probes it as a broadcast literal — membership testing
    * with NO gram-keyed shuffle at all. Bloom guarantees: no false
    * negatives (every truly contaminated doc is flagged — the property
    * decontamination must not lose), false positives at the sketch's
    * fpp. No SQL oracle (the sketch isn't DuckDB-expressible);
    * tolerance_check quantifies it against the exact twin: superset
    * always, near-equality at this fpp.
    */
  private def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.{bloom_agg, bloom_might_contain}
    val grams = Ops.spreadNarrow(docs(spark, dir))
      .withColumn("split", Cur.splitAssign(col("doc_id"), "split-v1",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .select(col("doc_id"), col("split"),
        explode(word_ngrams(col("text"), 5)).as("g"))
    val train = grams.filter(col("split") === "train")
    // Sketch sizing WITHOUT shingling the corpus an extra time: grams
    // per doc < words ≤ n_chars/2, so sum(n_chars)/2 over the train
    // split upper-bounds the gram count from the pruned one-column
    // n_chars scan (over-estimating only sharpens the sketch). Capped
    // at Spark's default runtime-filter limits (4M items / 64M bits —
    // at a larger corpus raise
    // spark.sql.optimizer.runtime.bloomFilter.max* and these with it).
    val trainChars = docs(spark, dir)
      .withColumn("split", Cur.splitAssign(col("doc_id"), "split-v1",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .filter(col("split") === "train")
      .agg(coalesce(sum("n_chars"), lit(0L))).head.getLong(0)
    val items = math.min(math.max(1L, trainChars / 2), 4000000L)
    val sketch = train
      .agg(bloom_agg(col("g"), items,
        math.min(items * 30, 67108864L)).as("bf"))
      .head.getAs[Array[Byte]](0)
    grams.filter(col("split") =!= "train")
      .filter(bloom_might_contain(sketch, col("g")))
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** Sequence packing — group documents into fixed-budget (512-token)
    * training sequences, the step between curation and the tokenizer.
    * Greedy streaming packing WITHIN deterministic hash shards: a
    * document joins the sequence its cumulative token offset starts
    * in. Per-shard windows keep the packing embarrassingly parallel
    * (shards = tasks; no global sort, no single-partition window), and
    * the shard is [[Cur.hashBucket]]-assigned so the layout is
    * reproducible. Reported per sequence: docs packed and token fill.
    */
  private def seqPack(spark: SparkSession, dir: String): DataFrame = {
    val t = docs(spark, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      Cur.hashBucket(col("doc_id"), "pack-v1", 8).as("shard"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
    t.withColumn("start_tok", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_id", expr("start_tok div 512"))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .orderBy("shard", "seq_id")
  }

  private val seqPackSql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |      ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END
       |      AS n_tokens,
       |    ${bucketSql("pack-v1", 8)} AS shard
       |  FROM documents),
       |c AS (
       |  SELECT shard, doc_id, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
       |      - n_tokens AS start_tok
       |  FROM t)
       |SELECT shard, CAST(start_tok // 512 AS BIGINT) AS seq_id,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |FROM c GROUP BY 1, 2 ORDER BY shard, seq_id""".stripMargin

  /** Byte-budget shard manifest ([[Cur.shardByBytes]]): the corpus in
    * doc_id order cut into ~16 KiB shards by exact global byte offset
    * — the export step that writes training data as bounded files with
    * a manifest. The interesting part is HOW the offset is computed:
    * the naive global-ordered window is a one-partition funnel at
    * 100 TB; the operator uses the two-phase form (per-bucket sums →
    * tiny bucket-level prefix window → broadcast offsets + per-bucket
    * local windows) and the oracle checks it equals the naive global
    * cumsum exactly.
    */
  private def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val sized = docs(spark, dir).select(col("doc_id"),
      length(col("text")).cast("bigint").as("bytes"))
    Cur.shardByBytes(sized, "doc_id", col("bytes"),
      budget = 16384L, bucketSize = 64L)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("bytes").as("total_bytes"))
      .orderBy("shard_id")
  }

  private val shardManifestSql =
    """WITH sized AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS bytes
      |  FROM documents),
      |c AS (SELECT doc_id, bytes,
      |    coalesce(sum(bytes) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      |  FROM sized)
      |SELECT CAST(start // 16384 AS BIGINT) AS shard_id,
      |  count(*) AS n_docs, CAST(sum(bytes) AS BIGINT) AS total_bytes
      |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin

  /** Stratified sampling: exactly `min(n, |stratum|)` documents per
    * language, chosen by hash order — [[Cur.capPerGroup]] ordered on
    * the salted bucket, so the sample is uniform WITHIN each stratum
    * yet fully deterministic (reruns pick the same docs; the judge of
    * that is the exact oracle). One keyed window shuffle.
    */
  private def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Cur.capPerGroup(docs(spark, dir), col("lang"),
      Seq(Cur.hashBucket(col("doc_id"), "strat-v1", 1000000).asc,
        col("doc_id").asc), n = 20)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"), sum("n_chars").as("total_chars"),
        min("doc_id").as("first_doc"))
      .orderBy("lang")

  private val stratifiedSampleSql =
    s"""WITH ranked AS (
       |  SELECT lang, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY ${bucketSql("strat-v1", 1000000)}, doc_id) AS rn
       |  FROM documents)
       |SELECT lang, count(*) AS n_sampled,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  min(doc_id) AS first_doc
       |FROM ranked WHERE rn <= 20
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-language adaptive quality gate: keep each language's top 75%
    * by quality score (percent_rank ≥ 0.25) — the threshold adapts to
    * every stratum's own distribution instead of one global cutoff
    * that would starve low-scoring languages. One window shuffle per
    * language partition; quality is the codegen'd
    * [[TextAnalysis.qualityScore]] whose cross-engine rounding is
    * already pinned by `d_text_stats`.
    */
  private def qualityGate(spark: SparkSession, dir: String): DataFrame = {
    val scored = Ops.spreadNarrow(docs(spark, dir)).select(
      col("doc_id"), col("lang"), col("n_chars"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val w = Window.partitionBy("lang").orderBy("quality")
    scored.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= 0.25)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        round(min("quality"), 4).as("min_quality"),
        sum("n_chars").as("total_chars"))
      .orderBy("lang")
  }

  private val qualityGateSql =
    """WITH base AS (
      |  SELECT doc_id, lang, n_chars, text,
      |    list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_tokens,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
      |        / length(text) END AS praw
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang, n_chars,
      |    floor((least(n_tokens::DOUBLE / 100.0, 1.0::DOUBLE) * 0.4::DOUBLE
      |      + (1.0::DOUBLE - praw) * 0.3::DOUBLE
      |      + (CASE WHEN len(toks) = 0 THEN 0.0
      |          ELSE len(list_intersect(toks,
      |            ['the','a','an','and','or','of','to','in','is','it']))::DOUBLE
      |            / len(toks) END) * 0.3::DOUBLE) * 10000) / 10000 AS quality
      |  FROM base),
      |gated AS (
      |  SELECT * FROM (
      |    SELECT *, percent_rank() OVER (PARTITION BY lang
      |      ORDER BY quality) AS pr
      |    FROM scored)
      |  WHERE pr >= 0.25)
      |SELECT lang, count(*) AS n_kept,
      |  round(min(quality), 4) AS min_quality,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM gated GROUP BY lang ORDER BY lang""".stripMargin

  /** Weighted sampling: 20 docs per language drawn with probability
    * proportional to length ([[Cur.weightedSampleKey]], A-ES
    * exponential keys). The rank runs per stratum over the floored
    * key — a bounded top-k per group, distributable without a global
    * sort — and the whole decision is a pure function of
    * (salt, doc_id, n_chars), so the oracle recomputes the SAME sample
    * in SQL: the sampling decisions hash-compare, like every other
    * curation gate here.
    */
  private def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir).filter(col("n_chars") > 0)
      .withColumn("skey", Cur.weightedSampleKey(col("doc_id"),
        col("n_chars").cast("double"), "wsample-v1"))
    base.withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("skey"), col("doc_id"))))
      .filter(col("rk") <= 20)
      .select(col("lang"), col("rk").cast("bigint").as("rk"),
        col("doc_id"), col("n_chars"), col("skey"))
      .orderBy("lang", "rk")
  }

  private val weightedSampleSql =
    """WITH keyed AS (
      |  SELECT lang, doc_id, n_chars,
      |    floor(-ln((CAST(('0x' || substr(md5('wsample-v1:' ||
      |        CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
      |      / 4294967297.0) / CAST(n_chars AS DOUBLE) * 1e12) / 1e12
      |      AS skey
      |  FROM documents WHERE n_chars > 0),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY lang
      |    ORDER BY skey, doc_id) AS rk
      |  FROM keyed)
      |SELECT lang, rk, doc_id, n_chars, skey
      |FROM ranked WHERE rk <= 20 ORDER BY lang, rk""".stripMargin

  /** Length-bucketed batching: assign each document to the smallest
    * power-of-two token-capacity bucket that fits it, and report per
    * bucket how much padding a fixed-shape batch of that capacity
    * wastes — the step that decides batch shapes before tokenization
    * (padding cost is the difference between ragged docs and
    * rectangular tensors). The bucket boundary is a CASE ladder, NOT
    * `2^ceil(log2 n)`: float log at exact powers of two is
    * engine-dependent, the ladder is bit-identical everywhere. All
    * outputs are integers (no rounded ratios — see SCALE.md's
    * cross-engine determinism rule). One scan, one ≤9-group agg.
    */
  private def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    val caps = Seq(16, 32, 64, 128, 256, 512, 1024, 2048)
    val n = TextAnalysis.tokenCount(col("text"))
    val cap = caps.reverse.foldLeft(lit(4096): Column) { (acc, c) =>
      when(n <= c, c).otherwise(acc)
    }
    docs(spark, dir)
      .select(n.as("n_tokens"), cap.as("bucket_cap"))
      .groupBy("bucket_cap")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"))
      .withColumn("padding_tokens",
        col("n_docs") * col("bucket_cap") - col("sum_tokens"))
      .orderBy("bucket_cap")
  }

  private val lengthBucketsSql =
    """WITH t AS (
      |  SELECT CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(string_split_regex(lower(trim(text)), '\s+')) END
      |      AS n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT n_tokens,
      |    CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
      |      WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
      |      WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
      |      WHEN n_tokens <= 1024 THEN 1024 WHEN n_tokens <= 2048 THEN 2048
      |      ELSE 4096 END AS bucket_cap
      |  FROM t)
      |SELECT bucket_cap, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  count(*) * bucket_cap - CAST(sum(n_tokens) AS BIGINT)
      |    AS padding_tokens
      |FROM b GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin

  /** Deterministic seeded global shuffle — the per-epoch document
    * permutation a training pipeline needs, as a pure function of
    * (salt, doc_id): order by the salted md5, shard by its first 32
    * bits. Positions come from per-shard row_number windows, so the
    * permutation materializes with one hash shuffle into 32 uniform
    * shards and NO global sort; changing the salt reshuffles every
    * epoch reproducibly. The oracle replays the identical hash text,
    * so shard AND position must match exactly.
    */
  /** Exact sampling-quota apportionment (Hamilton / largest
    * remainder): split a budget of N=997 sample slots across sources
    * PROPORTIONAL to their character mass, with Σquota = N exactly —
    * naive per-domain rounding under- or over-shoots the budget, and
    * a float share drifts at half boundaries. All integer: floor
    * share = (N·wᵢ) div W, then the N − Σfloor leftover slots go to
    * the largest remainders (N·wᵢ mod W, ties → source asc). The
    * windows run over the DOMAIN-sized weight relation (20 rows here,
    * thousands at worst — the Analytics global-window rule); the fact
    * table contributes one partial+final weight fold. Downstream, the
    * per-source quota feeds `d_stratified_sample`'s exactly-n-per-
    * stratum machinery.
    */
  private def quotaAlloc(spark: SparkSession, dir: String): DataFrame = {
    val n = 997L
    val w = docs(spark, dir).groupBy("source")
      .agg(sum("n_chars").as("w"))
    val wAll = Window.partitionBy(lit(1))
    val rank = Window.partitionBy(lit(1))
      .orderBy(col("rem").desc, col("source"))
    w.withColumn("tw", sum("w").over(wAll))
      .withColumn("floor_q", expr(s"($n * w) div tw"))
      .withColumn("rem", expr(s"($n * w) % tw"))
      .withColumn("deficit", lit(n) - sum("floor_q").over(wAll))
      .withColumn("rn", row_number().over(rank))
      .select(col("source"), col("w").as("weight"),
        (col("floor_q") + when(col("rn") <= col("deficit"), 1L)
          .otherwise(0L)).as("quota"))
      .orderBy("source")
  }

  private val quotaAllocSql =
    """WITH w AS (
      |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
      |  FROM documents GROUP BY source),
      |t AS (SELECT *, CAST(sum(w) OVER () AS BIGINT) AS tw FROM w),
      |f AS (SELECT *, (997 * w) // tw AS floor_q,
      |    (997 * w) % tw AS rem FROM t),
      |d AS (SELECT *,
      |    997 - CAST(sum(floor_q) OVER () AS BIGINT) AS deficit,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rn
      |  FROM f)
      |SELECT source, w AS weight,
      |  floor_q + CASE WHEN rn <= deficit THEN 1 ELSE 0 END AS quota
      |FROM d ORDER BY source""".stripMargin

  /** Per-document n-gram NOVELTY — the curriculum/dedup triage score:
    * what fraction of a doc's 5-gram occurrences appear here FIRST
    * (by doc_id ingest order) rather than in any earlier document?
    * ≈1 = fresh content, ≈0 = restatement of the earlier corpus —
    * finer-grained than pairwise near-dup because it charges partial
    * copying proportionally. Two gram-keyed shuffles (first-occurrence
    * fold, then the join-back — the `d_decontaminate` shape; under a
    * skewed gram distribution the same broadcast maxDf cap applies);
    * the score is floor-scaled integer division, engine-exact.
    */
  private def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = docs(spark, dir).select(col("doc_id"),
      explode(word_ngrams(col("text"), 5)).as("g"))
    val first = grams.groupBy("g").agg(min("doc_id").as("first_doc"))
    grams.join(first, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_e4", expr("(n_novel * 10000) div n_grams"))
      .orderBy("doc_id")
  }

  private val ngramNoveltySql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)),
      |    '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
      |  FROM toks, unnest(range(1, len(t) - 3)) AS r(i)
      |  WHERE len(t) >= 5),
      |first AS (SELECT g, min(doc_id) AS first_doc FROM grams
      |  GROUP BY g),
      |agg AS (
      |  SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |    CAST(sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_novel
      |  FROM grams gr JOIN first f USING (g)
      |  GROUP BY gr.doc_id)
      |SELECT doc_id, n_grams, n_novel,
      |  (n_novel * 10000) // n_grams AS novelty_e4
      |FROM agg ORDER BY doc_id""".stripMargin

  private def globalShuffle(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("shuf-v1:"), col("doc_id").cast("string")))
    val sharded = docs(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard",
        conv(substring(col("h"), 1, 8), 16, 10).cast("long") % 32)
    sharded
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy("h", "doc_id")))
      .select("shard", "pos", "doc_id")
      .orderBy("shard", "pos")
  }

  private val globalShuffleSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    md5('shuf-v1:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, h,
      |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 32 AS shard
      |  FROM t)
      |SELECT shard,
      |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos,
      |  doc_id
      |FROM s ORDER BY shard, pos""".stripMargin

  /** Temporal train/validation split with an EMBARGO gap — the
    * leakage-safe companion to the hash split (`d_split_assign`):
    * when examples carry time and the task is forecasting, a random
    * split leaks the future into training, and even a clean cut leaks
    * through serial correlation at the boundary — so rows inside the
    * embargo window between train-end and validation-start are
    * DROPPED, not assigned. Pure per-row date arithmetic (no shuffle
    * until the audit fold); the output is the per-split row/date-range
    * accounting the pipeline gates on before training.
    */
  private def temporalSplit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .withColumn("split",
        when(col("o_orderdate") < lit("1997-07-01"), "train")
          .when(col("o_orderdate") >= lit("1997-10-01"), "validation")
          .otherwise("embargo"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        date_format(min("o_orderdate"), "yyyy-MM-dd").as("first_date"),
        date_format(max("o_orderdate"), "yyyy-MM-dd").as("last_date"))
      .orderBy("split")

  private val temporalSplitSql =
    """SELECT CASE
      |    WHEN o_orderdate < TIMESTAMP '1997-07-01' THEN 'train'
      |    WHEN o_orderdate >= TIMESTAMP '1997-10-01' THEN 'validation'
      |    ELSE 'embargo' END AS split,
      |  count(*) AS n_rows,
      |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
      |  strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
      |FROM orders GROUP BY 1 ORDER BY split""".stripMargin

  /** DUP-CLUSTER-SAFE split — the third leakage axis beside the hash
    * split (identity, `d_split_assign`) and the temporal split (time,
    * `d_temporal_split`): duplicate documents must land in ONE split,
    * or eval rows sit verbatim in training and the benchmark measures
    * memorization. Each document keys by its normalized word-set (the
    * `d_dedup_exact` key); the split is assigned to the group
    * REPRESENTATIVE (min doc_id) and inherited by every member, so no
    * duplicate pair can straddle a boundary BY CONSTRUCTION — and the
    * result still carries a `LEAKED` audit row (groups spanning
    * splits, 0) because the pipeline gates on evidence, not
    * construction. Cost vs the free per-doc hash split: one key-group
    * shuffle + one key join — the price of the guarantee. At 100 TB
    * the join key drops to the 8-byte fingerprint
    * (`d_dedup_fingerprint`'s trade); the text key here keeps the
    * DuckDB oracle byte-exact. The NEAR-dup variant of the same shape
    * (embedding-cluster rep assigns, members inherit) is
    * `e_cluster_split` — together they close both duplicate grains.
    */
  private def splitDedupSafe(spark: SparkSession, dir: String): DataFrame = {
    val keyed = docs(spark, dir)
      .withColumn("k", graft.operators.Dedup.wordSetKey(col("text")))
    val reps = keyed.groupBy("k").agg(min("doc_id").as("rep"))
    val assigned = keyed.join(reps, "k")
      .withColumn("split", Cur.splitAssign(col("rep"), "dds-v1",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
    val perSplit = assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("k")).as("n_groups"))
    val leaked = assigned.groupBy("k")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1)
      .agg(count(lit(1)).as("n_docs"))
      .select(lit("LEAKED").as("split"), col("n_docs"),
        lit(0L).as("n_groups"))
    perSplit.unionByName(leaked).orderBy("split")
  }

  private val splitDedupSafeSql =
    """WITH kd AS (
      |  SELECT doc_id,
      |    array_to_string(list_sort(list_distinct(
      |      string_split_regex(lower(trim(text)), '\s+'))), ' ') AS k
      |  FROM documents),
      |r AS (
      |  SELECT k AS rk,
      |    CAST(('0x' || substr(md5('dds-v1:' ||
      |      CAST(min(doc_id) AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
      |  FROM kd GROUP BY 1),
      |a AS (
      |  SELECT kd.doc_id, kd.k,
      |    CASE WHEN b < 80 THEN 'train'
      |         WHEN b < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM kd JOIN r ON kd.k = r.rk)
      |SELECT split, count(*) AS n_docs,
      |  count(DISTINCT k) AS n_groups
      |FROM a GROUP BY 1
      |UNION ALL
      |SELECT 'LEAKED' AS split, count(*) AS n_docs,
      |  CAST(0 AS BIGINT) AS n_groups
      |FROM (SELECT k FROM a GROUP BY k
      |      HAVING count(DISTINCT split) > 1)
      |ORDER BY split""".stripMargin

  /** PII scrubbing — the redaction pass every released corpus runs:
    * emails, phone numbers, and IPv4 addresses replaced with typed
    * placeholder tokens, per-pattern counts kept for the release
    * audit. Pure codegen'd regexp_replace/regexp_extract_all over the
    * scan — zero shuffles before the final sort, embarrassingly
    * parallel at any scale (the same shape as the quality gates).
    * The fixture corpus contains no PII, so the spans under test are
    * CONSTRUCTED deterministically from doc_id (one email, one phone,
    * one IP appended per doc — the codec-seam discipline: synthetic
    * input, real plumbing) and the oracle re-runs the identical
    * construction + regexes in DuckDB, gating byte-exact redaction via
    * md5 of the scrubbed text. Patterns stay in the RE2 ∩ Java-regex
    * dialect (\\d, \\w, explicit classes — no lookbehind) so both
    * engines compile them identically.
    */
  private def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phonePat = "\\+\\d{2} \\d{3}-\\d{3}-\\d{4}"
    val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val withPii = docs(spark, dir)
      .select(col("doc_id"), concat(col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@example.com or +01 555-000-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7")).as("text"))
    withPii
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0)))
          .cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("text"), lit(phonePat), lit(0)))
          .cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(col("text"), lit(ipPat), lit(0)))
          .cast("long"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          emailPat, "<EMAIL>"), phonePat, "<PHONE>"), ipPat, "<IP>"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        col("n_ips"), md5(col("scrubbed")).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  private val piiScrubSql =
    """WITH withpii AS (
      |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
      |    || '@example.com or +01 555-000-'
      |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
      |    AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |    AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text,
      |    '\+\d{2} \d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
      |  CAST(len(regexp_extract_all(text,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
      |  md5(regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
      |    'g'), '\+\d{2} \d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))
      |    AS scrubbed_md5
      |FROM withpii ORDER BY doc_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("d_quota_alloc", quotaAlloc, Some(quotaAllocSql)),
    NamedQuery("d_ngram_novelty", ngramNovelty, Some(ngramNoveltySql)),
    NamedQuery("d_pii_scrub", piiScrub, Some(piiScrubSql)),
    NamedQuery("d_temporal_split", temporalSplit, Some(temporalSplitSql)),
    NamedQuery("d_split_dedup_safe", splitDedupSafe,
      Some(splitDedupSafeSql)),
    NamedQuery("d_weighted_sample", weightedSample,
      Some(weightedSampleSql)),
    NamedQuery("d_length_buckets", lengthBuckets, Some(lengthBucketsSql)),
    NamedQuery("d_global_shuffle", globalShuffle, Some(globalShuffleSql)),
    NamedQuery("d_split_assign", splitAssign, Some(splitAssignSql)),
    NamedQuery("d_domain_cap", domainCap, Some(domainCapSql)),
    NamedQuery("d_mix_uniform", mixUniform, Some(mixUniformSql)),
    NamedQuery("d_mix_temperature", mixTemperature, Some(mixTemperatureSql)),
    NamedQuery("d_decontaminate", decontaminate, Some(decontaminateSql)),
    NamedQuery("d_decontaminate_bloom", decontaminateBloom, None),
    NamedQuery("d_seq_pack", seqPack, Some(seqPackSql)),
    NamedQuery("d_shard_manifest", shardManifest, Some(shardManifestSql)),
    NamedQuery("d_stratified_sample", stratifiedSample,
      Some(stratifiedSampleSql)),
    NamedQuery("d_quality_gate", qualityGate, Some(qualityGateSql)))
}
