package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Ops, Similarity}

/** Training-data pipeline operators as declared queries over the
  * `documents` and `embeddings` tables (builder-prompt extension
  * surface: dedup family, similarity search, text analysis).
  *
  * Oracle notes: embeddings are float32; every oracle casts to
  * DOUBLE[] so DuckDB accumulates in double exactly like the
  * [[graft.expressions.Kernels.cosineF]] kernel (verified bit-for-bit).
  * Hash-based operators (MinHash, SimHash, FNV fingerprints, SRP
  * buckets) have no SQL-expressible oracle — the driver records
  * rows-only checks; their exact specs are pinned by ScalaTest instead.
  */
object TrainingData {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")

  // ---- dedup ----

  /** Unicode-canonical dedup keys ([[graft.expressions.NfcNormalize]],
    * a codegen'd expression — Spark has no built-in normalizer): NFC
    * ("café" composed) and NFD (e + combining acute) spellings of the
    * same text are byte-different, so every hash/shingle dedup sees two
    * documents until normalization folds them. The corpus is unioned
    * with a planted NFC/NFD pair (built via chr() on BOTH engines so no
    * source-encoding ambiguity exists) and counted raw vs normalized —
    * the normalized count must be one lower. At 100 TB this is a
    * zero-shuffle map step in front of the fingerprint, with an
    * isNormalized fast path that returns the input untouched for the
    * (dominant) already-composed case.
    */
  private def nfcDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // planted pair as Scala \u escapes — Spark SQL's chr() is mod-256
    // (bytes, not codepoints), so the oracle builds the same two
    // strings with DuckDB's codepoint chr() instead
    val planted = Seq("caf\u00e9 latte", "cafe\u0301 latte").toDF("text")
    docs(spark, dir).select(col("text"))
      .unionByName(planted)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("text")).as("n_raw_forms"),
        countDistinct(graft.functions.GraftFunctions
          .nfc_normalize(col("text"))).as("n_nfc_forms"))
  }

  private val nfcDedupSql =
    """WITH v AS (
      |  SELECT text FROM documents
      |  UNION ALL SELECT 'caf' || chr(233) || ' latte'
      |  UNION ALL SELECT 'cafe' || chr(769) || ' latte')
      |SELECT count(*) AS n_rows, count(DISTINCT text) AS n_raw_forms,
      |  count(DISTINCT nfc_normalize(text)) AS n_nfc_forms
      |FROM v""".stripMargin

  private def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(
      docs(spark, dir).withColumn("k", Dedup.wordSetKey(col("text"))),
      "doc_id", "k")
      .filter(col("dup_count") > 1)
      .orderBy("dup_key")

  private val dedupExactSql =
    """SELECT array_to_string(list_sort(list_distinct(
      |    string_split_regex(lower(trim(text)), '\s+'))), ' ') AS dup_key,
      |  min(doc_id) AS keep_id, count(*) AS dup_count
      |FROM documents
      |GROUP BY 1 HAVING count(*) > 1
      |ORDER BY dup_key""".stripMargin

  /** Passage-level exact dedup — the boilerplate scrub real pretraining
    * corpora run BELOW document grain (repeated navigation text, license
    * headers, quote chains appear inside otherwise-unique pages):
    * documents split into fixed 20-word passages; a passage keeps only
    * its FIRST occurrence corpus-wide (ordered by (doc_id, position) —
    * deterministic), and each document reports how much of it survived.
    * One pass, one passage-keyed shuffle for the first-occurrence
    * window — never a self-join. At 100 TB the window key would be the
    * passage's 8-byte fingerprint (fnv1a64, same trade as
    * `d_dedup_fingerprint`) rather than its text; the text key here
    * keeps the DuckDB oracle byte-exact. Exact oracle: same chunking,
    * same first-occurrence rule in SQL.
    */
  private def passageDedup(spark: SparkSession, dir: String): DataFrame = {
    val P = 20
    val chunks = Ops.spreadNarrow(docs(spark, dir))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(t) / $P.0) as int) - 1), " +
          s"i -> array_join(slice(t, i * $P + 1, $P), ' '))")))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "passage")
    val firstSeen = Window.partitionBy("passage").orderBy("doc_id", "idx")
    chunks.withColumn("rn", row_number().over(firstSeen))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("retained",
        floor(col("n_kept") / col("n_passages") * 1e4) / 1e4)
      .orderBy("doc_id")
  }

  private val passageDedupSql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)),
      |    '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id, i AS idx,
      |    array_to_string(t[(i*20+1):(i*20+20)], ' ') AS passage
      |  FROM toks, unnest(range(0,
      |    CAST(ceil(len(t) / 20.0) AS BIGINT))) AS u(i)
      |  WHERE len(t) > 0),
      |ranked AS (
      |  SELECT doc_id,
      |    row_number() OVER (PARTITION BY passage ORDER BY doc_id, idx)
      |      AS rn
      |  FROM chunks)
      |SELECT doc_id, count(*) AS n_passages,
      |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  floor(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) * 1e4) / 1e4 AS retained
      |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def dedupFingerprint(spark: SparkSession, dir: String): DataFrame =
    Dedup.fingerprintDedup(
      docs(spark, dir).withColumn("k", Dedup.wordSetKey(col("text"))),
      "doc_id", "k")
      .filter(col("dup_count") > 1)
      .select("fp", "keep_id", "dup_count")
      .orderBy("keep_id")

  /** Incremental dedup ([[Dedup.incrementalDedup]]): classify the new
    * batch (doc_id % 5 = 0, the "today's crawl" stand-in) against the
    * PERSISTED key index of everything already ingested — seeded once
    * per corpus dir, so the timed/verified path reads the index table,
    * never the corpus. The nightly shape at 100 TB: O(batch + index
    * join), corpus untouched.
    */
  private val incrDedupSeeded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def incrDedup(spark: SparkSession, dir: String): DataFrame = {
    val idxPath = incrDedupSeeded.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_dedup_idx").toString + "/keys"
      docs(spark, d).filter(col("doc_id") % 5 =!= 0)
        .select(Dedup.wordSetKey(col("text")).as("k")).distinct()
        .write.parquet(p)
      p
    })
    val batch = docs(spark, dir).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), Dedup.wordSetKey(col("text")).as("k"))
    Dedup.incrementalDedup(batch, "doc_id", "k",
      spark.read.parquet(idxPath))
      .select("doc_id", "status")
      .orderBy("doc_id")
  }

  /** Incremental NEAR-dup detection against a persisted MinHash index
    * — the nightly-crawl shape of the similarity family, as
    * [[incrDedup]] is of exact dedup: the corpus's capped trigram
    * shingle sets, banded signature rows, and (crucially) its FROZEN
    * stop-shingle list are built once and persisted; a new batch
    * (doc_id % 5 = 0) shingles under the same stop list, collides with
    * the index on (table, signature) buckets, and exact-rescores only
    * the collisions against the index's stored shingle sets. The
    * corpus TEXT is never rescanned — probe cost is O(batch + matched
    * index rows). Same parameters as `d_minhash_capped`
    * (trigram, maxDf=0.004 over the full corpus, 8 tables, exact
    * jaccard ≥ 0.6), so its recall law carries over: a qualifying pair
    * is missed only if all 8 signature slots differ.
    * tolerance_check.json pins recall against the capped-jaccard twin
    * restricted to batch×corpus pairs; emitted pairs are exact by
    * construction (rescored on true shingle sets).
    */
  private val mhIndexSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def incrMinhash(spark: SparkSession, dir: String): DataFrame = {
    val root = mhIndexSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_minhash_idx").toString
      val all = docs(spark, d)
      val hot = Dedup.hotShingleArray(all, "doc_id", "text",
        n = 3, maxDf = 0.004, nDocsDenominator = all.count())
      hot.write.parquet(s"$p/hot")
      val corpusToks = Dedup.cappedGrams(
        all.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
        n = 3, hot = spark.read.parquet(s"$p/hot"))
      corpusToks.write.parquet(s"$p/toks")
      Dedup.minhashBands(spark.read.parquet(s"$p/toks"),
        numHashTables = 8, seed = 42L)
        .write.partitionBy("t").parquet(s"$p/bands")
      p
    })
    val hot = spark.read.parquet(s"$root/hot")
    val batchToks = Dedup.cappedGrams(
      docs(spark, dir).filter(col("doc_id") % 5 === 0), "doc_id", "text",
      n = 3, hot = hot)
      .repartition(col("id"))
    val batchBands = Dedup.minhashBands(batchToks,
      numHashTables = 8, seed = 42L)
    val cand = batchBands
      .select(col("id").as("batch_id"), col("t"), col("sig"))
      .join(spark.read.parquet(s"$root/bands")
        .select(col("id").as("corpus_id"), col("t"), col("sig")),
        Seq("t", "sig"))
      .select("batch_id", "corpus_id").distinct()
    val inter = size(array_intersect(col("toks_b"), col("toks_c")))
      .cast("double")
    cand
      .join(batchToks.select(col("id").as("batch_id"),
        col("toks").as("toks_b")), "batch_id")
      .join(spark.read.parquet(s"$root/toks")
        .select(col("id").as("corpus_id"), col("toks").as("toks_c")),
        "corpus_id")
      .withColumn("jaccard", round(inter /
        (size(col("toks_b")) + size(col("toks_c")) - inter), 4))
      .filter(col("jaccard") >= 0.6)
      .select(least(col("batch_id"), col("corpus_id")).as("id_a"),
        greatest(col("batch_id"), col("corpus_id")).as("id_b"),
        col("jaccard"))
      .orderBy("id_a", "id_b")
  }

  private val incrDedupSql =
    """WITH k AS (SELECT doc_id, array_to_string(list_sort(list_distinct(
      |    string_split_regex(lower(trim(text)), '\s+'))), ' ') AS k
      |  FROM documents),
      |corpus AS (SELECT DISTINCT k FROM k WHERE doc_id % 5 <> 0),
      |batch AS (SELECT doc_id, k FROM k WHERE doc_id % 5 = 0),
      |firsts AS (SELECT k, min(doc_id) AS first_id FROM batch GROUP BY k)
      |SELECT b.doc_id,
      |  CASE WHEN c.k IS NOT NULL THEN 'dup_corpus'
      |       WHEN b.doc_id <> f.first_id THEN 'dup_batch'
      |       ELSE 'new' END AS status
      |FROM batch b LEFT JOIN corpus c USING (k) JOIN firsts f USING (k)
      |ORDER BY b.doc_id""".stripMargin

  private def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(docs(spark, dir), "doc_id", "text",
      n = 1, threshold = 0.6)
      .orderBy("id_a", "id_b")

  private val jaccardPairsSql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(list_distinct(
      |    string_split_regex(lower(trim(text)), '\s+')), x -> x <> '') AS s
      |  FROM documents WHERE trim(text) <> '')
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(len(list_intersect(a.s, b.s))::DOUBLE
      |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
      |FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
      |ORDER BY id_a, id_b""".stripMargin

  private def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(docs(spark, dir), "doc_id", "text",
      numHashTables = 8, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** The SCALE PATH of the similarity-join family under the gate:
    * TRIGRAM shingles instead of single words, plus a hot-shingle cap
    * (document frequency > maxDf × corpus size dropped by broadcast
    * anti-join BEFORE the candidate join). This corpus is deliberately
    * adversarial — a ~30-word shared vocabulary where every WORD
    * appears in ~78-80% of documents, so the uncapped word-level twins
    * are quadratic by definition (excluded from bench). Word trigrams
    * are selective (max df ≈ 0.5-1.4% here), so candidates track
    * genuine near-duplicates and the join cost scales with true
    * collisions; the cap then removes the residual hot shingles
    * (boilerplate phrases in a real corpus). These run in the bench
    * set — they are the 100 TB form of the family.
    */
  private def jaccardCapped(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(docs(spark, dir), "doc_id", "text",
      n = 3, threshold = 0.6, maxDf = 0.004)
      .orderBy("id_a", "id_b")

  /** Exact oracle for the capped scale path: trigram shingling and the
    * df cap are both plain SQL, so even the stop-shingle machinery sits
    * under the hash-compare gate.
    */
  private val jaccardCappedSql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)),
      |    '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
      |    i -> array_to_string(t[i:i+2], ' '))) AS gs
      |  FROM toks WHERE len(t) >= 3),
      |exploded AS (SELECT doc_id, g FROM grams, unnest(gs) AS u(g)),
      |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
      |hot AS (SELECT g FROM (
      |    SELECT g, count(*) AS df FROM exploded GROUP BY g) d, nd
      |  WHERE d.df > 0.004 * nd.n),
      |kept AS (SELECT doc_id, g FROM exploded
      |  WHERE g NOT IN (SELECT g FROM hot)),
      |sized AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.id_a, p.id_b,
      |  round(p.common::DOUBLE / (sa.sz + sb.sz - p.common), 4) AS jaccard
      |FROM pairs p
      |JOIN sized sa ON sa.doc_id = p.id_a
      |JOIN sized sb ON sb.doc_id = p.id_b
      |WHERE round(p.common::DOUBLE / (sa.sz + sb.sz - p.common), 4) >= 0.6
      |ORDER BY id_a, id_b""".stripMargin

  /** Prefix-filtered EXACT twin of the trigram family
    * ([[graft.operators.Dedup.ppjoinPairs]]): the UNCAPPED trigram
    * Jaccard relation — same semantics a naive all-shingle join
    * computes — via PPJoin prefix filtering, so the candidate join
    * sees only each doc's rarest `(1−t)`-fraction of shingles. Where
    * `d_jaccard_capped` trades semantics (drops hot shingles from the
    * score) for scale, this keeps the exact score and still never
    * joins on hot shingles — they rank last and fall outside every
    * prefix. Exact oracle: DuckDB computes uncapped trigram Jaccard
    * directly.
    */
  private def ppjoinPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.ppjoinPairs(docs(spark, dir), "doc_id", "text",
      n = 3, threshold = 0.6)
      .orderBy("id_a", "id_b")

  private val ppjoinPairsSql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)),
      |    '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
      |    i -> array_to_string(t[i:i+2], ' '))) AS gs
      |  FROM toks WHERE len(t) >= 3),
      |exploded AS (SELECT doc_id, g FROM grams, unnest(gs) AS u(g)),
      |sized AS (SELECT doc_id, len(gs) AS sz FROM grams WHERE len(gs) > 0),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |  FROM exploded a JOIN exploded b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.id_a, p.id_b,
      |  round(p.common::DOUBLE / (sa.sz + sb.sz - p.common), 4) AS jaccard
      |FROM pairs p
      |JOIN sized sa ON sa.doc_id = p.id_a
      |JOIN sized sb ON sb.doc_id = p.id_b
      |WHERE round(p.common::DOUBLE / (sa.sz + sb.sz - p.common), 4) >= 0.6
      |ORDER BY id_a, id_b""".stripMargin

  /** MinHash twin of [[jaccardCapped]]: same trigram shingles, same
    * maxDf cap ahead of the banded bucket join. No SQL oracle (minhash
    * signatures aren't SQL-expressible); rows-only check + the
    * recall-vs-exact number in tolerance_check.json.
    */
  private def minhashCapped(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(docs(spark, dir), "doc_id", "text",
      numHashTables = 8, threshold = 0.6, maxDf = 0.004, n = 3)
      .orderBy("id_a", "id_b")

  /** Winnowing document fingerprints ([[Dedup.winnowPairs]], the MOSS
    * scheme): char-level near-dup detection — rolling-hash 16-grams of
    * the normalized text, window-4 minimum selection, overlap
    * coefficient over the fingerprint sets, boilerplate fingerprints
    * (df > 2%) capped map-side. The char-level complement to the
    * word-level jaccard/minhash family: shared substrings ≥ 19
    * normalized chars are guaranteed detected regardless of word
    * re-ordering elsewhere in the document. No SQL oracle (the rolling
    * hash and window-min selection aren't DuckDB-expressible); DedupSpec
    * pins the kernel against an independent direct-hash reimplementation
    * and the guarantee law, and tolerance_check.json records recall vs
    * the exact capped-jaccard twin.
    */
  private def winnowPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairs(docs(spark, dir), "doc_id", "text",
      k = 16, w = 4, threshold = 0.5, maxDf = 0.02)
      .orderBy("id_a", "id_b")

  private def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    // maxHamming must stay below bands (pigeonhole) AND bands must stay
    // wide enough to discriminate: 16 bands of 4 bits would be
    // recall-complete for hamming<=8 but a 4-bit key has 16 values →
    // ~n²/16 collisions per band (measured 10× slower at sf0.1). The
    // selective regime for 64-bit simhash is hamming<=3 over 4×16-bit
    // bands — near-identical texts sit well inside it.
    Dedup.simhashPairs(docs(spark, dir), "doc_id", "text",
      maxHamming = 3, bands = 4)
      .orderBy("id_a", "id_b")

  // ---- text analysis ----

  private def textStats(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    docs(spark, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(t).as("n_tokens"),
      TextAnalysis.regexTokenCount(t).as("n_regex_tokens"),
      round(TextAnalysis.punctRatio(t), 4).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(t), 4).as("stopword_ratio"),
      TextAnalysis.qualityScore(t).as("quality"))
      .orderBy("doc_id")
  }

  private val textStatsSql =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_tokens,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
      |        / length(text) END AS praw
      |  FROM documents),
      |enriched AS (
      |  SELECT doc_id, n_tokens, praw, text,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |      ELSE len(list_intersect(toks,
      |        ['the','a','an','and','or','of','to','in','is','it']))::DOUBLE
      |        / len(toks) END AS sraw
      |  FROM base)
      |SELECT doc_id, n_tokens,
      |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_regex_tokens,
      |  round(praw, 4) AS punct_ratio,
      |  round(sraw, 4) AS stopword_ratio,
      |  floor((least(n_tokens::DOUBLE / 100.0, 1.0::DOUBLE) * 0.4::DOUBLE
      |    + (1.0::DOUBLE - praw) * 0.3::DOUBLE
      |    + sraw * 0.3::DOUBLE) * 10000) / 10000 AS quality
      |FROM enriched ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition signals per document: duplicate-word
    * fraction and the most-frequent word bigram's share of all bigrams
    * — the standard "low-quality by repetition" quality gates for LLM
    * corpora (high top-bigram share = boilerplate/keyword-stuffed
    * text). Tokens follow the [[TextAnalysis.tokens]] contract; bigram
    * lists keep duplicates (`slice` + `zip_with`), unlike the
    * de-duplicating `WordNGrams` shingle expression the dedup family
    * uses — frequency is the whole point here.
    *
    * Ratios are floor-scaled to 4 digits, not rounded (see
    * [[NamedQuery]] — round-to-decimal differs between engines exactly
    * on half boundaries, and these ARE small-integer ratios that can
    * land there, e.g. 13/32). At scale: the (doc, bigram) count keys
    * the shuffle by doc_id+bigram so one hot document cannot skew a
    * partition, and the per-doc argmax is a keyed window, not a global
    * sort. Docs with <2 tokens have no bigrams and are excluded by
    * contract.
    */
  private def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .withColumn("n_words", size(col("w")).cast("bigint"))
      .filter(col("n_words") >= 2)
      .withColumn("n_distinct", size(array_distinct(col("w"))).cast("bigint"))
      .withColumn("bigram", explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat_ws(" ", a, b))))
      .drop("w")
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("c").desc, col("bigram").asc)
    base
      .groupBy("doc_id", "n_words", "n_distinct", "bigram")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_words"),
        (floor((lit(1.0) - col("n_distinct").cast("double") / col("n_words"))
          * 10000) / 10000).as("dup_word_frac"),
        col("bigram").as("top_bigram"), col("c").as("top_bigram_n"),
        (floor(col("c").cast("double") / (col("n_words") - 1) * 10000)
          / 10000).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  private val repetitionStatsSql =
    """WITH d AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> x <> '') AS w
      |  FROM documents),
      |base AS (SELECT doc_id, len(w) AS n_words,
      |    len(list_distinct(w)) AS n_distinct, w
      |  FROM d WHERE len(w) >= 2),
      |bg AS (SELECT doc_id, n_words, n_distinct,
      |    w[i] || ' ' || w[i + 1] AS bigram
      |  FROM base, unnest(range(1, len(w))) AS t(i)),
      |counts AS (SELECT doc_id, n_words, n_distinct, bigram,
      |    count(*) AS c
      |  FROM bg GROUP BY 1, 2, 3, 4),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY c DESC, bigram) AS rn FROM counts)
      |SELECT doc_id, n_words,
      |  floor((1 - n_distinct::DOUBLE / n_words) * 10000) / 10000
      |    AS dup_word_frac,
      |  bigram AS top_bigram, c AS top_bigram_n,
      |  floor(c::DOUBLE / (n_words - 1) * 10000) / 10000
      |    AS top_bigram_frac
      |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Intra-document stutter scrub ([[TextAnalysis.collapseRepeats]]):
    * collapse runs of consecutive duplicate tokens, keeping the first
    * of each run. Zero shuffles — a pure codegen'd per-row rewrite that
    * runs at scan speed; at 100 TB this is a map-only pass.
    */
  private def collapseRepeatsQ(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        array_remove(split(trim(col("text")), "\\s+"), "").as("w"))
    val kept = TextAnalysis.collapseRepeats(col("w"))
    base.select(col("doc_id"),
      size(col("w")).cast("bigint").as("n_words"),
      size(kept).cast("bigint").as("n_kept"),
      array_join(kept, " ").as("text_clean"))
      .orderBy("doc_id")
  }

  private val collapseRepeatsSql =
    """WITH d AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |      x -> x <> '') AS w
      |  FROM documents WHERE length(trim(text)) > 0),
      |idx AS (SELECT doc_id, w, i
      |  FROM d, unnest(range(1, len(w) + 1)) AS t(i)),
      |kept AS (SELECT doc_id, w[i] AS tok, i
      |  FROM idx WHERE i = 1 OR w[i] <> w[i - 1])
      |SELECT d.doc_id, len(d.w) AS n_words,
      |  count(k.i) AS n_kept,
      |  string_agg(k.tok, ' ' ORDER BY k.i) AS text_clean
      |FROM d JOIN kept k USING (doc_id)
      |GROUP BY d.doc_id, len(d.w)
      |ORDER BY doc_id""".stripMargin

  private def langId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  private val langIdSql = {
    val sets = TextAnalysis.langStopwords.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ",", "]")
    }
    val scores = sets.map { case (l, arr) =>
      s"len(list_intersect(toks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = sets.map(_._1)
    val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_distinct(
       |    string_split_regex(lower(trim(text)), '\\s+')) AS toks
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id,
       |    $scores
       |  FROM toks),
       |best AS (SELECT *, $m AS m FROM scored)
       |SELECT doc_id,
       |  CASE WHEN m = 0 THEN 'und' $cases ELSE 'und' END AS lang_pred
       |FROM best ORDER BY doc_id""".stripMargin
  }

  /** PMI phrase mining (word2phrase's scoring step): rank adjacent
    * word pairs by pointwise mutual information —
    * ln(p(w1w2) / (p(w1)·p(w2))) — to find collocations worth merging
    * into single tokenizer units ("new york" → "new_york"). One
    * posexplode + per-doc lead() builds the bigram stream; pair counts
    * shuffle once on the pair, unigram counts are vocab-sized and the
    * two totals are 1-row broadcasts, so nothing scales beyond the
    * vocabulary. min-count 5 suppresses the PMI small-count
    * pathology; PMI floor-scales at 4 digits (round-half drift) and
    * the top-20 is a bounded TakeOrdered. Exact DuckDB oracle: the
    * identical tokenization contract (`TextAnalysis.tokens` ≡
    * filtered `string_split_regex`), windows, and ln nesting.
    */
  private def phraseMine(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
      .toDF("doc_id", "pos", "token")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bi = toks.withColumn("nxt", lead("token", 1).over(w))
      .filter(col("nxt").isNotNull)
    val big = bi.groupBy(col("token").as("w1"), col("nxt").as("w2"))
      .agg(count(lit(1)).as("pair_count"))
    val uni = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val nUni = toks.agg(count(lit(1)).as("n_uni"))
    val nBi = bi.agg(count(lit(1)).as("n_bi"))
    big
      .join(uni.select(col("token").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("token").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .filter(col("pair_count") >= 5)
      .select(col("w1"), col("w2"), col("pair_count"),
        (floor(log((col("pair_count") / col("n_bi")) /
          ((col("c1") / col("n_uni")) * (col("c2") / col("n_uni"))))
          * 10000) / 10000).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }

  private val phraseMineSql =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> x <> '') AS ws
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, ws[i] AS token, i AS ord FROM base,
      |    (SELECT unnest(generate_series(1, len(ws))) AS i)),
      |bi AS (
      |  SELECT token AS w1,
      |    lead(token) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
      |  FROM toks),
      |big AS (SELECT w1, w2, count(*) AS pair_count FROM bi
      |  WHERE w2 IS NOT NULL GROUP BY 1, 2),
      |uni AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
      |tot AS (SELECT count(*) AS n_uni FROM toks),
      |tb AS (SELECT count(*) AS n_bi FROM bi WHERE w2 IS NOT NULL)
      |SELECT w1, w2, pair_count,
      |  floor(ln((pair_count / n_bi) /
      |    ((u1.c / n_uni) * (u2.c / n_uni))) * 10000) / 10000 AS pmi
      |FROM big JOIN uni u1 ON big.w1 = u1.token
      |  JOIN uni u2 ON big.w2 = u2.token, tot, tb
      |WHERE pair_count >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  private def tokenTopK(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20)

  private val tokenTopKSql =
    """SELECT t.token, count(*) AS freq
      |FROM documents, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(token)
      |WHERE t.token <> ''
      |GROUP BY t.token ORDER BY freq DESC, t.token LIMIT 20""".stripMargin

  /** Vocabulary coverage curve — the tokenizer-design question "how
    * much of the token mass do the top-V types cover?", answered as
    * the full cumulative curve over the top-1000 types (this corpus's
    * vocabulary is smaller, so the whole curve emits). The token-count
    * relation aggregates once
    * (vocab-sized, one shuffle); the top-1000 slice is a BOUNDED
    * TakeOrdered (≤1000 rows per map task cross the wire, never the
    * vocabulary), so the single-partition cumulative window that
    * follows runs over ≤1000 rows by construction — the funnel a
    * global vocab window would be at 100 TB never forms. Coverage is
    * exact-integer division (bit-identical across engines).
    */
  private def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum("freq").as("total_tokens"))
    val ord = Seq(col("freq").desc, col("token"))
    val w = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.orderBy(ord: _*).limit(1000)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
      .withColumn("cum_freq", sum("freq").over(w))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("freq"), col("cum_freq"),
        col("total_tokens"),
        (col("cum_freq").cast("double") /
          col("total_tokens").cast("double")).as("coverage"))
      .orderBy("rank")
  }

  private val vocabCoverageSql =
    """WITH counts AS (
      |  SELECT t.token, count(*) AS freq
      |  FROM documents,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(token)
      |  WHERE t.token <> ''
      |  GROUP BY t.token),
      |total AS (SELECT CAST(sum(freq) AS BIGINT) AS total_tokens
      |  FROM counts),
      |top AS (
      |  SELECT token, freq,
      |    row_number() OVER (ORDER BY freq DESC, token) AS rank
      |  FROM counts ORDER BY freq DESC, token LIMIT 1000),
      |c AS (
      |  SELECT rank, token, freq,
      |    CAST(sum(freq) OVER (ORDER BY rank) AS BIGINT) AS cum_freq
      |  FROM top)
      |SELECT rank, token, freq, cum_freq, total_tokens,
      |  CAST(cum_freq AS DOUBLE) / CAST(total_tokens AS DOUBLE)
      |    AS coverage
      |FROM c CROSS JOIN total ORDER BY rank""".stripMargin

  /** The capstone composition — the actual cleaning pass a 100 TB
    * training-data pipeline runs, as ONE declared query under the
    * exact-SQL gate: quality-score every document, language-ID it,
    * drop low-quality/unidentified docs, exact-dedup the survivors
    * (min doc_id per word-set key), then report corpus stats per
    * language. Every stage is a stock codegen'd projection or a single
    * keyed shuffle — the whole pipeline is two exchanges (dedup key +
    * final lang agg): filters fuse into the scan, the expensive
    * similarity/multimodal stages bolt on after the cheap gates have
    * shrunk the corpus (the order that matters at scale).
    */
  private def cleanPipeline(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    // the corpus file is one row group (unsplittable): spread it so the
    // regex-heavy scoring runs across the session width, not one task
    val base = Ops.spreadNarrow(docs(spark, dir)).select(col("doc_id"), t,
      TextAnalysis.qualityScore(t).as("quality"),
      TextAnalysis.langId(t).as("lang"),
      TextAnalysis.tokenCount(t).cast("bigint").as("n_tokens"))
    val kept = base.filter(col("quality") >= 0.5 && col("lang") =!= "und")
      .withColumn("k", Dedup.wordSetKey(col("text")))
    val surv = kept
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")))
      .filter(col("doc_id") === col("keep_id"))
    surv.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(avg("quality"), 3).as("avg_quality"))
      .orderBy("lang")
  }

  private val cleanPipelineSql = {
    val sets = TextAnalysis.langStopwords.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ",", "]")
    }
    val scores = sets.map { case (l, arr) =>
      s"len(list_intersect(toks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = sets.map(_._1)
    val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |      ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END AS n_tokens,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |      ELSE (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
       |        / length(text) END AS praw
       |  FROM documents),
       |enriched AS (
       |  SELECT doc_id, toks, n_tokens, praw,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE len(list_intersect(toks,
       |        ['the','a','an','and','or','of','to','in','is','it']))::DOUBLE
       |        / len(toks) END AS sraw,
       |    $scores
       |  FROM base),
       |scored AS (
       |  SELECT doc_id, toks, n_tokens,
       |    floor((least(n_tokens::DOUBLE / 100.0, 1.0::DOUBLE) * 0.4::DOUBLE
       |      + (1.0::DOUBLE - praw) * 0.3::DOUBLE
       |      + sraw * 0.3::DOUBLE) * 10000) / 10000 AS quality,
       |    $m AS m,
       |    CASE WHEN $m = 0 THEN 'und' $cases ELSE 'und' END AS lang
       |  FROM enriched),
       |kept AS (
       |  SELECT doc_id, n_tokens, quality, lang,
       |    array_to_string(list_sort(toks), ' ') AS k
       |  FROM scored WHERE quality >= 0.5 AND lang <> 'und'),
       |surv AS (
       |  SELECT * FROM kept
       |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY k))
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  round(avg(quality), 3) AS avg_quality
       |FROM surv GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Sketch twin of `d_token_topk` ([[graft.functions.HeavyHitters]]):
    * Count-Min estimates + per-partition candidates instead of a full
    * token shuffle. No SQL oracle (CMS isn't DuckDB-expressible);
    * HeavyHittersSpec pins exactness on a planted skewed fixture and
    * the tolerance artifact quantifies overlap with the exact twin.
    */
  private def tokenTopKApprox(spark: SparkSession, dir: String): DataFrame =
    graft.functions.HeavyHitters.approxTopK(
      docs(spark, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token")),
      "token", k = 20)

  // ---- similarity search ----

  private def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.bruteForceTopK(all, all.filter(col("id") < 5), k = 5)
      .orderBy("query_id", "rank")
  }

  private val annTopKSql =
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.qid AS query_id, e.vec_id AS corpus_id,
      |    round(list_cosine_similarity(q.qe,
      |      CAST(e.embedding AS DOUBLE[])), 4) AS cosine
      |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, corpus_id) AS rank
      |  FROM scored)
      |SELECT query_id, corpus_id, cosine, rank FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Filtered ANN — top-k among corpus vectors satisfying a metadata
    * predicate (here: sharing the query's label), the "nearest docs in
    * language X" shape every retrieval service needs. The filter is
    * applied as a PRE-filter: the label becomes an equi-join key, so
    * candidates shrink by the label's selectivity BEFORE any cosine is
    * computed — post-filtering a label-blind top-k would under-fill k
    * whenever fewer than k of the global neighbours share the label.
    * At 100 TB with a partitioned/bucketed label column this is a
    * pruned scan, not even a full pass.
    */
  private def annFiltered(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val q = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val scored = Ops.spreadNarrow(all)
      .join(broadcast(q), col("label") === col("q_label")
        && col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosine_sim(
          col("q_emb"), col("embedding")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("corpus_id"),
        col("label"), col("cosine"), col("rank"))
      .orderBy("query_id", "rank")
  }

  private val annFilteredSql =
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe,
      |    label AS q_label
      |  FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.qid AS query_id, e.vec_id AS corpus_id, e.label,
      |    round(list_cosine_similarity(q.qe,
      |      CAST(e.embedding AS DOUBLE[])), 4) AS cosine
      |  FROM embeddings e JOIN q
      |    ON e.label = q.q_label AND e.vec_id <> q.qid),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, corpus_id) AS rank
      |  FROM scored)
      |SELECT query_id, corpus_id, label, cosine, rank FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Same answer as `e_ann_topk`, computed through the bounded
    * [[graft.functions.TopKAggregator]] instead of a window sort: the
    * partial/final agg ships ≤k rows per (query, map task) — the plan
    * that survives a corpus 1000× larger. Shares `e_ann_topk`'s oracle.
    */
  private def annTopKAgg(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    val q = all.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("embedding").as("q_emb"))
    val scored = all
      .select(col("id").as("corpus_id"), col("embedding").as("c_emb"))
      .crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(graft.functions.GraftFunctions.cosine_sim(
          col("q_emb"), col("c_emb")), 4).as("cosine"))
    graft.functions.TopK.perKey(scored, k = 5)
      .orderBy("query_id", "rank")
  }

  /** IVF-quantized ANN (k-means cells, nProbe-of-nCells search) — the
    * third similarity path beside brute force and SRP-LSH. No SQL
    * oracle (k-means isn't SQL-expressible); SimilaritySpec pins
    * recall and the nProbe=nCells ≡ brute-force equality. The index
    * (coarse quantizer fit + cell assignment) is built ONCE per corpus
    * and held ([[Similarity.ivfFit]]) — that is the ANN contract:
    * index build is a batch job, queries amortize it. The declared
    * query therefore measures the probe path.
    */
  private val ivfIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.IvfIndex]()

  private def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val index = ivfIndexes.computeIfAbsent(dir, { d =>
      Similarity.ivfFit(
        embs(spark, d).select(col("vec_id").as("id"), col("embedding")))
    })
    val q = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
      .filter(col("id") < 5)
    Similarity.ivfProbe(index, q, k = 5, nProbe = 6)
      .orderBy("query_id", "rank")
  }

  /** SQ8 scalar-quantized ANN ([[Similarity.sq8TopK]]): int8 coarse
    * scoring over 4×-smaller codes, exact float rerank of a bounded
    * shortlist. Because the rerank recomputes exact cosine, the result
    * equals `e_ann_topk` whenever the true top-5 survive the coarse
    * ranking — a 10×k shortlist (rerank=50) leaves a wide margin over
    * the observed int8 ranking error on this corpus (SimilaritySpec
    * pins the rerank ≥ |corpus| ≡ brute-force law and recall at the
    * tighter rerank=25; the shared oracle checks this setting), so it
    * shares the brute-force SQL oracle.
    */
  private def sq8TopK(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.sq8TopK(all, all.filter(col("id") < 5), k = 5, rerank = 50)
      .orderBy("query_id", "rank")
  }

  private def nearDupEmbeddings(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(
      embs(spark, dir).select(col("vec_id").as("id"), col("embedding")),
      threshold = 0.4)
      .orderBy("id_a", "id_b")

  private val nearDupEmbeddingsSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |    CAST(b.embedding AS DOUBLE[])), 4) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |    CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  /** Pairs → clusters: connected components over the exact near-dup
    * pair relation ([[Dedup.connectedComponents]], min-label
    * propagation), reported per duplicate cluster. This is the step
    * that makes pairwise dedup actionable — chains (a~b, b~c) collapse
    * to ONE survivor even when a and c never matched directly. Oracle:
    * DuckDB's recursive CTE computes the same transitive closure.
    */
  /** The near-dup CLUSTER relation (exact pairs at cosine ≥ 0.4 →
    * connected components), persisted ONCE per corpus and read by its
    * three consumers (`e_dup_clusters`, `e_cluster_reps`,
    * `e_contrastive_batches`) — the posting-index discipline: cluster
    * a 100 TB corpus once, then representatives / batch shaping /
    * audits are reads of the (id, cluster) table, never a re-pairing.
    * Correctness is unchanged — each consumer's oracle still verifies
    * the full closure values.
    */
  private val clusterSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededClusters(spark: SparkSession, dir: String): String =
    clusterSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_cluster_seed").toString + "/clusters"
      val pairs = Similarity.nearDupPairs(
        embs(spark, d).select(col("vec_id").as("id"), col("embedding")),
        threshold = 0.4)
      Dedup.connectedComponents(pairs, "id_a", "id_b").write.parquet(p)
      p
    })

  private def dupClusters(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(seededClusters(spark, dir))
      .groupBy("cluster")
      .agg(count(lit(1)).as("size"), max("id").as("max_id"))
      .orderBy("cluster")

  private val dupClustersSql =
    """WITH RECURSIVE pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])), 4) >= 0.4),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
      |labeled AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
      |SELECT cluster, count(*) AS size, max(id) AS max_id
      |FROM labeled GROUP BY cluster ORDER BY cluster""".stripMargin

  /** Contrastive-batch shaping
    * ([[graft.operators.Curation.contrastiveBatches]]): the near-dup
    * clusters feed batch assignment so no cluster contributes two
    * docs to one training batch — in-batch negatives stay true
    * negatives. Result is the per-batch audit; `max_per_cluster` must
    * read 1 on every row (the law IS the gated output). Oracle: the
    * `e_dup_clusters` recursive-CTE closure extended with the same
    * window-rank + modular-stagger arithmetic — integers end to end.
    */
  private def contrastiveBatches(spark: SparkSession,
      dir: String): DataFrame = {
    val clustered = spark.read.parquet(seededClusters(spark, dir))
    val members = embs(spark, dir).select(col("vec_id").as("id"))
      .join(clustered, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    graft.operators.Curation.contrastiveBatches(members, nBatches = 16)
      .groupBy("batch", "cluster").agg(count(lit(1)).as("m"))
      .groupBy("batch")
      .agg(sum("m").as("n_docs"), count(lit(1)).as("n_clusters"),
        max("m").as("max_per_cluster"))
      .orderBy("batch")
  }

  private val contrastiveBatchesSql =
    """WITH RECURSIVE pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])), 4) >= 0.4),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
      |labeled AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
      |members AS (
      |  SELECT e.vec_id AS id, coalesce(l.cluster, e.vec_id) AS cluster
      |  FROM embeddings e LEFT JOIN labeled l ON l.id = e.vec_id),
      |assigned AS (
      |  SELECT id, cluster, (rank0 + cluster % 16) % 16 AS batch
      |  FROM (SELECT id, cluster, row_number() OVER (
      |      PARTITION BY cluster ORDER BY id) - 1 AS rank0 FROM members)
      |  WHERE rank0 < 16),
      |bc AS (SELECT batch, cluster, count(*) AS m FROM assigned
      |  GROUP BY 1, 2)
      |SELECT batch, CAST(sum(m) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_clusters,
      |  CAST(max(m) AS BIGINT) AS max_per_cluster
      |FROM bc GROUP BY batch ORDER BY batch""".stripMargin

  /** CLUSTER-AWARE train/val/test split — the test-set-leakage guard:
    * near-duplicates of a test document must not train, so the split
    * is keyed on the near-dup CLUSTER id (its min-member
    * representative), not the document id. Every cluster then lands
    * whole on one side of each boundary by construction — the audit
    * columns prove it (`max_splits_per_cluster` must read 1,
    * `n_straddling` 0 — the law IS the gated output, the
    * contrastive-batches discipline). Same salted-md5 bucket function
    * as `d_split_assign`, so assignment is a pure (salt, cluster)
    * function: reruns, repartitions, and cluster scale-out cannot
    * move a document across the boundary. At 100 TB: clusters come
    * from the persisted near-dup pass (never recomputed here), the
    * split is one map over (id, cluster) plus a cluster-keyed agg.
    */
  private def clusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val clustered = spark.read.parquet(seededClusters(spark, dir))
    val members = embs(spark, dir).select(col("vec_id").as("id"))
      .join(clustered, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    val split = graft.operators.Curation.splitAssign(col("cluster"),
      "csplit-v1", Seq("train" -> 80, "val" -> 10, "test" -> 10))
    members.withColumn("split", split)
      .groupBy("cluster")
      .agg(countDistinct("split").as("n_splits"),
        count(lit(1)).as("size"), min("split").as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_clusters"), sum("size").as("n_docs"),
        max("n_splits").as("max_splits_per_cluster"),
        count(when(col("n_splits") > 1, lit(1))).as("n_straddling"))
      .orderBy("split")
  }

  private val clusterSplitSql =
    """WITH RECURSIVE pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])), 4) >= 0.4),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
      |labeled AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
      |members AS (
      |  SELECT e.vec_id AS id, coalesce(l.cluster, e.vec_id) AS cluster
      |  FROM embeddings e LEFT JOIN labeled l ON l.id = e.vec_id),
      |assigned AS (
      |  SELECT id, cluster,
      |    CASE WHEN bucket < 80 THEN 'train'
      |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT id, cluster,
      |      CAST(('0x' || substr(md5('csplit-v1:' ||
      |        CAST(cluster AS VARCHAR)), 1, 8)) AS BIGINT) % 100
      |        AS bucket
      |    FROM members) h),
      |per_cluster AS (
      |  SELECT cluster, count(DISTINCT split) AS n_splits,
      |    count(*) AS size, min(split) AS split
      |  FROM assigned GROUP BY cluster)
      |SELECT split, CAST(count(*) AS BIGINT) AS n_clusters,
      |  CAST(sum(size) AS BIGINT) AS n_docs,
      |  CAST(max(n_splits) AS BIGINT) AS max_splits_per_cluster,
      |  CAST(count(CASE WHEN n_splits > 1 THEN 1 END) AS BIGINT)
      |    AS n_straddling
      |FROM per_cluster GROUP BY split ORDER BY split""".stripMargin

  /** Multiprobe SRP-LSH (6 tables × 8 query-side probes): each query
    * visits its base bucket plus its 7 lowest-margin neighbouring
    * buckets per table, ~8×ing the candidate pool for the SAME
    * corpus-side index (one bucket per table per corpus row — index
    * size and the big-side shuffle are unchanged). Tuned on this
    * corpus via a (bits, tables, probes) sweep: 4 tables plateau at
    * recall 0.4 no matter how many probes (the missed neighbours land
    * in far buckets of all four tables); 6 tables alone reach 0.64;
    * 6 tables + 8 probes reach 0.84. Recall vs brute force is pinned
    * in the tolerance artifact (bound ≥ 0.6).
    */
  private def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.lshTopK(all, all.filter(col("id") < 5), k = 5,
      numBits = 8, tables = 6, nProbes = 8)
      .orderBy("query_id", "rank")
  }

  /** SemDeDup-style semantic dedup pairs ([[Similarity.semDedupPairs]]):
    * near-dup pairs found only within IVF quantizer cells, each vector
    * soft-assigned to its 2 nearest cells — ~4·n²/nCells work instead
    * of n², the embedding-side scale path the brute-force
    * `e_neardup_pairs` is the oracle twin for. Soft assignment is what
    * makes the blocking honest at a low similarity threshold: hard
    * cells recover 0.42 of the exact pair set on this corpus, the
    * 2-nearest soft assignment 0.92 for 4× the candidate volume. No
    * SQL oracle (k-means blocking); ToleranceCheck pins the recall and
    * every emitted pair carries its exact cosine.
    */
  private val semDedupCentroids =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def semDedup(spark: SparkSession, dir: String): DataFrame = {
    // the quantizer is the corpus's once-built clustering (same
    // contract as the IVF index queries): fit on first touch per dir,
    // reuse after — dedup never re-fits k-means per run
    val centroids = semDedupCentroids.computeIfAbsent(dir, { d =>
      Similarity.ivfFit(
        embs(spark, d).select(col("vec_id").as("id"), col("embedding")),
        nCells = 8, cache = false).centroids
    })
    Similarity.semDedupPairsWith(
      embs(spark, dir).select(col("vec_id").as("id"), col("embedding")),
      threshold = 0.4, centroids, assignTo = 2)
      .orderBy("id_a", "id_b")
  }

  /** Near-dup-aware curation: keep the BEST document of each duplicate
    * cluster (longest, then lowest id) rather than the arbitrary
    * min-id survivor — the rule real corpus curation uses, composed
    * from the exact pair relation, connected components, and a
    * per-cluster argmax. Cluster relations are tiny next to the corpus
    * (only docs that matched anything), so the window runs over a
    * bounded input.
    */
  private def clusterRepresentatives(spark: SparkSession,
      dir: String): DataFrame = {
    val clusters = spark.read.parquet(seededClusters(spark, dir))
    val toks = docs(spark, dir).select(col("doc_id").as("id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val byCluster = Window.partitionBy("cluster")
    clusters.join(toks, "id")
      .withColumn("rn", row_number().over(
        byCluster.orderBy(col("n_tokens").desc, col("id"))))
      .withColumn("size", count(lit(1)).over(byCluster))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("size"), col("id").as("rep_id"),
        col("n_tokens").as("rep_tokens"))
      .orderBy("cluster")
  }

  private val clusterRepresentativesSql =
    """WITH RECURSIVE pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])), 4) >= 0.4),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
      |labeled AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
      |toks AS (SELECT doc_id AS id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
      |      ELSE len(list_filter(string_split_regex(lower(trim(text)),
      |        '\s+'), x -> x <> '')) END AS n_tokens
      |  FROM documents),
      |j AS (SELECT l.cluster, l.id, t.n_tokens
      |  FROM labeled l JOIN toks t USING (id)),
      |ranked AS (SELECT *,
      |    row_number() OVER (PARTITION BY cluster
      |      ORDER BY n_tokens DESC, id) AS rn,
      |    count(*) OVER (PARTITION BY cluster) AS size
      |  FROM j)
      |SELECT cluster, size, id AS rep_id, n_tokens AS rep_tokens
      |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin

  /** Probe-only ANN against a PERSISTED IVF index
    * ([[Similarity.ivfSave]]/[[Similarity.ivfLoad]]): the fit+assign
    * batch job runs once per corpus and lands as cell-partitioned
    * Parquet; this query measures what a steady-state ANN service
    * pays — open the index, prune to nProbe cell directories, score.
    * Same recall contract as `e_ivf_topk` (tolerance artifact).
    */
  private val ivfSavedPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def seededIvfIndex(spark: SparkSession, dir: String): String =
    ivfSavedPaths.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_ivf_index").toString + "/ivf"
      val idx = Similarity.ivfFit(
        embs(spark, d).select(col("vec_id").as("id"), col("embedding")),
        cache = false)
      Similarity.ivfSave(idx, p)
      p
    })

  private def ivfPersisted(spark: SparkSession, dir: String): DataFrame = {
    val idxPath = seededIvfIndex(spark, dir)
    val q = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
      .filter(col("id") < 5)
    Similarity.ivfProbe(Similarity.ivfLoad(spark, idxPath), q, k = 5,
        nProbe = 6)
      .orderBy("query_id", "rank")
  }

  /** STREAMING maintenance of the ANN index — the embedding-side twin
    * of `st_posting_maint`, and the shape a continuous-ingest training
    * pipeline actually runs: the coarse quantizer is a rare batch job
    * (its centroids FREEZE between retrains), while arriving
    * embeddings are assigned per micro-batch against the broadcast
    * centroid table ([[Similarity.assignToCells]] — O(batch × nCells),
    * the index itself never read) and APPENDED into the
    * cell-partitioned index, which stays probe-able mid-build (a
    * partitioned append only adds files under touched cell dirs).
    * After AvailableNow drains the staged corpus (4 source files →
    * 4 maintenance batches), the SAME probe as `e_ivf_persisted` runs
    * against the stream-built index; recall vs the exact brute-force
    * top-k is tolerance-pinned, proving incremental maintenance lost
    * no vectors and probes see everything that streamed through. At
    * 100 TB this replaces recurring full-corpus re-indexing with
    * per-batch appends whose cost tracks batch size; cell-dir
    * fragmentation is `Ops.compactPartitions`' existing problem.
    */
  private val streamedIvfSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfMaintViaStream(spark: SparkSession,
      dir: String): DataFrame = {
    val centroids =
      Similarity.ivfLoad(spark, seededIvfIndex(spark, dir)).centroids
    val path = streamedIvfSeeds.computeIfAbsent(dir, { d =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_st_ivf").toString
      val src = s"$root/src"; val idx = s"$root/assigned"
      val ckpt = s"$root/ckpt"
      embs(spark, d).select(col("vec_id").as("id"), col("embedding"))
        .repartition(4).write.parquet(src)
      val schema = spark.read.parquet(src).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          Similarity.assignToCells(batch, centroids)
            .write.mode("append").partitionBy("cell").parquet(idx)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      idx
    })
    val q5 = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
      .filter(col("id") < 5)
    Similarity.ivfProbe(
      Similarity.IvfIndex(spark.read.parquet(path), centroids,
        centroids.count().toInt),
      q5, k = 5, nProbe = 6)
      .orderBy("query_id", "rank")
  }

  /** k-NN GRAPH construction — top-5 neighbours for EVERY corpus
    * vector, the input relation SemDeDup-style clustering, curation,
    * and graph algorithms (PageRank/components over near-dup edges)
    * consume. Two declared forms:
    *
    *  - `e_knn_exact`: the brute-force self-join — quadratic BY
    *    DEFINITION (all n top-k lists are the answer), so like the
    *    uncapped similarity joins it stays in the correctness gate as
    *    the exact oracle-checked baseline and out of the bench set.
    *  - `e_knn_graph`: every vector probes the PERSISTED IVF index
    *    ([[ivfPersisted]]'s — one fit, shared by both consumers):
    *    per-node work is nProbe/nCells of the index via partition
    *    pruning, so building the graph costs O(n · probed fraction),
    *    the 100 TB path. Recall vs the exact graph is tolerance-pinned
    *    (cell pruning bounds it exactly as in `e_ivf_topk`).
    */
  private def knnExact(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.bruteForceTopK(all, all, k = 5)
      .orderBy("query_id", "rank")
  }

  private val knnExactSql =
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.qid AS query_id, e.vec_id AS corpus_id,
      |    round(list_cosine_similarity(q.qe,
      |      CAST(e.embedding AS DOUBLE[])), 4) AS cosine
      |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, corpus_id) AS rank
      |  FROM scored)
      |SELECT query_id, corpus_id, cosine, rank FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.ivfProbe(
      Similarity.ivfLoad(spark, seededIvfIndex(spark, dir)), all, k = 5,
      nProbe = 6)
      .orderBy("query_id", "rank")
  }

  /** PQ/ADC top-k ([[Similarity.pqTopKWith]]): the corpus scans as
    * 16-byte PQ codes (16× under raw float32) with per-query ADC
    * table lookups, then an exact rerank of the top-50 shortlist.
    * Codebooks are trained ONCE per corpus on a bounded sample and
    * reused across runs (the long-lived-index contract, same as the
    * persisted IVF and SemDeDup quantizers); the declared query
    * matches the EXACT brute-force oracle — at (k=32 centroids,
    * rerank=100) the true top-5 always survive the coarse ADC ranking
    * on this corpus, with the k=32/rerank=50 point already at recall
    * 1.0 in the tuning sweep (the extra rerank is safety margin; at
    * scale rerank stays a constant per query regardless of corpus
    * size). Scale-checked: recall stays 1.0 at sf0.1 too (5 000
    * vectors, rerank = 2 % of the corpus), as does SQ8's at
    * rerank=50 — quantization error sits well under the neighbour
    * gap at 10× the tuning corpus.
    */
  private val pqCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.PqCodebooks]()

  private def pqTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    val cb = pqCodebooks.computeIfAbsent(dir,
      d => Similarity.pqFit(
        embs(spark, d).select(col("vec_id").as("id"), col("embedding")),
        m = 16, k = 32))
    Similarity.pqTopKWith(cb, all, all.filter(col("id") < 5), k = 5,
        rerank = 100)
      .orderBy("query_id", "rank")
  }

  /** IVF-PQ probe ([[Similarity.ivfPqFit]]/[[Similarity.ivfPqProbe]]):
    * the composed index — coarse cells prune WHICH corpus fraction a
    * query touches, 16-byte PQ codes bound the BYTES per touched row,
    * and the index holds no embeddings at all. Built once per corpus
    * (cached, like the IVF/PQ/SemDeDup structures); no SQL oracle
    * (k-means cells); ToleranceCheck pins recall vs brute force —
    * IVF-PQ tracks flat IVF's recall at the same nProbe=6, i.e. the
    * PQ stage loses essentially nothing past the cell pruning.
    */
  private val ivfPqIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.IvfPqIndex]()

  private def ivfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    val idx = ivfPqIndexes.computeIfAbsent(dir,
      d => Similarity.ivfPqFit(
        embs(spark, d).select(col("vec_id").as("id"), col("embedding"))))
    Similarity.ivfPqProbe(idx, all, all.filter(col("id") < 5), k = 5,
        nProbe = 6, rerank = 100)
      .orderBy("query_id", "rank")
  }

  /** Distributed BPE merge-rule training ([[graft.operators.Bpe]]):
    * 20 merge rules learned from the corpus's word-frequency table —
    * the vocabulary-learning half of the pipeline tokenizer. One
    * corpus pass builds (word, n); each round is a vocab-bounded pair
    * count + one-row argmax (ties to the smallest pair), so at 100 TB
    * the cost shape is k small jobs after one scan. No SQL oracle
    * (iterative argmax with threaded state); ToleranceCheck requires
    * SEQUENCE EQUALITY against [[graft.operators.Bpe.trainExact]] —
    * the same algorithm run driver-side on the collected
    * word-frequency table (`d_bpe_exact`, bench-excluded:
    * driver-serial by design).
    */
  private def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.train(
      graft.operators.Bpe.wordFreq(docs(spark, dir), "text"), 20)

  private def bpeExact(spark: SparkSession, dir: String): DataFrame = {
    val wf = graft.operators.Bpe.wordFreq(docs(spark, dir), "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.operators.Bpe.trainExact(spark, wf, 20)
  }

  /** Tokenizer inference under the learned rules
    * ([[graft.operators.Bpe.encode]]): per-document token and char
    * counts from rank-greedy BPE encoding — the pipeline's real
    * "how many tokens is this corpus" pass. The rule table is learned
    * once per sf dir (memoized — at scale it ships as a tiny artifact,
    * not a per-query recompute); ToleranceCheck re-derives every
    * per-doc count through an INDEPENDENT code path (sequential
    * full application of the merges in rank order — the training-side
    * replay, equal to rank-greedy by the standard BPE equivalence)
    * and requires set equality.
    */
  private val bpeRules =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private def learnedMerges(spark: SparkSession,
      dir: String): Seq[(String, String)] =
    bpeRules.computeIfAbsent(dir, { d =>
      graft.operators.Bpe.train(
        graft.operators.Bpe.wordFreq(docs(spark, d), "text"), 20)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    })

  private def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.encode(docs(spark, dir), "doc_id", "text",
      learnedMerges(spark, dir))
      .orderBy("doc_id")

  /** Triangles of the near-dup similarity graph
    * ([[graft.operators.Graph.triangles]], degree-ordered forward
    * algorithm): the structural step between pairwise similarity and
    * cluster quality — triangle-dense regions are true duplicate
    * communities, triangle-free chains are the transitive-closure
    * artifacts a curator treats with suspicion.
    *
    * The edge list is [[Similarity.signBandPairs]] — deterministic
    * sign-band LSH candidates re-verified by exact cosine — NOT the
    * brute-force crossJoin: at 100 TB the edge generation must be
    * bucketed (a key-equi shuffle), and because the banding is a pure
    * function of the stored floats the oracle replays the identical
    * relation, keeping the triangle enumeration EXACTLY checkable.
    * The brute-force pair relation stays oracle-anchored through
    * `e_neardup_pairs` / `e_dup_clusters`. A PlanSpec gate pins
    * no-CartesianProduct on this query's physical plan.
    */
  private def dupTriangles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.triangles(
      Similarity.signBandPairs(
        embs(spark, dir).select(col("vec_id").as("id"), col("embedding")),
        threshold = 0.3, bands = 10, bits = 6),
      // signBandPairs emits id_a < id_b, deduped — already canonical,
      // so the enumeration skips its re-canonicalization shuffle
      canonical = true)
      .orderBy("x", "y", "z")

  /** Shared oracle preamble: the sign-band candidate relation (band
    * key = integer-packed signs of six consecutive dims, 1-indexed —
    * the exact SQL mirror of [[Similarity.signBandPairs]]) joined back
    * to embeddings for exact-cosine verification at 0.3.
    */
  private val bandPairsCte =
    """WITH keyed AS (
      |  SELECT vec_id, band,
      |    (CASE WHEN embedding[band*6+1] >= 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN embedding[band*6+2] >= 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN embedding[band*6+3] >= 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN embedding[band*6+4] >= 0 THEN 8 ELSE 0 END)
      |    + (CASE WHEN embedding[band*6+5] >= 0 THEN 16 ELSE 0 END)
      |    + (CASE WHEN embedding[band*6+6] >= 0 THEN 32 ELSE 0 END) AS key
      |  FROM embeddings, range(0, 10) r(band)),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM keyed a JOIN keyed b
      |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
      |pairs AS (
      |  SELECT c.id_a, c.id_b
      |  FROM cand c
      |  JOIN embeddings ea ON ea.vec_id = c.id_a
      |  JOIN embeddings eb ON eb.vec_id = c.id_b
      |  WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
      |      CAST(eb.embedding AS DOUBLE[])), 4) >= 0.3)""".stripMargin

  private val dupTrianglesSql =
    s"""$bandPairsCte
      |SELECT p1.id_a AS x, p1.id_b AS y, p2.id_b AS z
      |FROM pairs p1
      |JOIN pairs p2 ON p2.id_a = p1.id_b
      |JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b
      |ORDER BY x, y, z""".stripMargin

  /** Local clustering coefficient over the same near-dup graph
    * ([[graft.operators.Graph.clusteringCoefficient]]): coefficient
    * ≈ 1 marks clique-like duplicate communities, ≈ 0 the hub nodes a
    * transitive-closure dedup should distrust. Edges come from the
    * same [[Similarity.signBandPairs]] bucketed generator as
    * `g_triangles` (see there for the oracle-replayable banding);
    * DuckDB recomputes triangles by three-way pair self-join and
    * degrees by endpoint unnest over the identical relation.
    */
  private def dupClustering(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.clusteringCoefficient(
      Similarity.signBandPairs(
        embs(spark, dir).select(col("vec_id").as("id"), col("embedding")),
        threshold = 0.3, bands = 10, bits = 6))
      .orderBy("node")

  private val dupClusteringSql =
    s"""$bandPairsCte,
      |deg AS (SELECT node, count(*) AS degree FROM (
      |    SELECT id_a AS node FROM pairs
      |    UNION ALL SELECT id_b FROM pairs)
      |  GROUP BY node),
      |tri AS (
      |  SELECT p1.id_a AS x, p1.id_b AS y, p2.id_b AS z
      |  FROM pairs p1
      |  JOIN pairs p2 ON p2.id_a = p1.id_b
      |  JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
      |tpn AS (SELECT node, count(*) AS n_triangles FROM (
      |    SELECT x AS node FROM tri
      |    UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri)
      |  GROUP BY node)
      |SELECT deg.node, deg.degree,
      |  coalesce(tpn.n_triangles, 0) AS n_triangles,
      |  CASE WHEN deg.degree >= 2
      |    THEN round(2.0 * coalesce(tpn.n_triangles, 0)
      |      / (deg.degree * (deg.degree - 1)), 4)
      |    ELSE 0.0 END AS clustering_coeff
      |FROM deg LEFT JOIN tpn USING (node)
      |ORDER BY node""".stripMargin

  /** Boolean term search against a PERSISTED inverted index: the
    * posting table (token, doc_id) is built once per corpus and laid
    * out hive-partitioned on a salted-md5 token bucket
    * ([[graft.operators.Curation.hashBucket]] — the same
    * engine-portable hash the curation split uses), so a conjunctive
    * query reads ONLY the queried terms' bucket directories (partition
    * pruning) and inside them only the queried tokens' rows (pushed
    * dictionary filter) — the corpus text is never rescanned at query
    * time. The intersection is one groupBy counting distinct matched
    * terms. Exact oracle: DuckDB answers the same conjunction by
    * scanning the text directly — the index path must return exactly
    * the scan path's documents. A PlanSpec gate asserts the bucket
    * partition filter lands in the posting scan.
    */
  private val postingSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val PostingBuckets = 16
  private val PostingSalt = "postings-v1"
  private[graft] val searchTerms = Seq("join", "hash", "scan")

  /** The posting rows carry token POSITIONS (one row per occurrence,
    * not per distinct token), so the same index answers boolean
    * conjunctions (`d_posting_search` — duplicate rows are harmless
    * under its distinct-count intersection) AND positional phrase
    * queries (`d_phrase_search`).
    */
  /** The posting-row projection shared by the batch seed and the
    * streaming index maintenance: one row per token OCCURRENCE with
    * its position and salted bucket.
    */
  private def postingRows(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), posexplode(array_remove(
        split(lower(trim(col("text"))), "\\s+"), "")))
      .withColumnRenamed("pos", "position")
      .withColumnRenamed("col", "token")
      .withColumn("bucket",
        graft.operators.Curation.hashBucket(col("token"), PostingSalt,
          PostingBuckets))

  private def seededPostings(spark: SparkSession, dir: String): String =
    postingSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_posting_seed").toString + "/postings"
      postingRows(docs(spark, d)).write.partitionBy("bucket").parquet(p)
      p
    })

  /** Driver-side twin of [[graft.operators.Curation.hashBucket]] for
    * literal terms (same md5-prefix arithmetic), so the query can name
    * the exact bucket directories to prune to.
    */
  private def termBucket(token: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest((PostingSalt + ":" + token).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % PostingBuckets
  }

  /** Conjunction search against a posting index at `path` — shared by
    * the batch-seeded (`d_posting_search`) and stream-maintained
    * (`st_posting_maint`) indexes: identical probe, different builder.
    */
  private def conjunctionSearch(spark: SparkSession, dir: String,
      path: String): DataFrame = {
    val buckets = searchTerms.map(termBucket).distinct
    val matched = spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*)
        && col("token").isin(searchTerms: _*))
      .groupBy("doc_id")
      .agg(countDistinct("token").as("n_terms"))
      .filter(col("n_terms") === searchTerms.length)
    matched.join(docs(spark, dir), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  private[graft] def postingSearch(spark: SparkSession,
      dir: String): DataFrame =
    conjunctionSearch(spark, dir, seededPostings(spark, dir))

  /** Streaming maintenance of the inverted index — the production
    * shape: documents arrive as a stream, each micro-batch's posting
    * rows APPEND into the bucket-partitioned index inside
    * `foreachBatch` (a partitioned append only adds files under the
    * touched bucket directories — existing postings are never
    * rewritten, and the index stays queryable mid-build). After
    * AvailableNow drains the backlog, the SAME conjunction probe as
    * `d_posting_search` runs against the stream-built index; the
    * DuckDB text-scan oracle then proves the invariant that matters —
    * incremental maintenance loses no postings and invents none. At
    * ingest scale this replaces recurring full-corpus index rebuilds
    * with per-batch appends whose cost tracks batch size; bucket-dir
    * fragmentation is the compaction problem `Ops.compactPartitions`
    * already owns.
    */
  private val streamedPostingSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def postingMaintViaStream(spark: SparkSession,
      dir: String): DataFrame = {
    val path = streamedPostingSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_st_postidx").toString + "/postings"
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_st_postidx_ckpt").toString
      val docStream = spark.readStream
        .schema(Tables(spark, d, "documents").schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
      val q = docStream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          postingRows(batch).write.mode("append")
            .partitionBy("bucket").parquet(p)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      p
    })
    conjunctionSearch(spark, dir, path)
  }

  private val postingSearchSql =
    """SELECT doc_id, lang, n_chars
      |FROM documents
      |WHERE list_contains(string_split_regex(lower(trim(text)), '\s+'),
      |    'join')
      |  AND list_contains(string_split_regex(lower(trim(text)), '\s+'),
      |    'hash')
      |  AND list_contains(string_split_regex(lower(trim(text)), '\s+'),
      |    'scan')
      |ORDER BY doc_id""".stripMargin

  /** Per-document token counts (dl) persisted BESIDE the posting index
    * — the tiny stats sidecar BM25 needs (one row per doc, two longs).
    * Built once per corpus from the already-seeded postings, never
    * from a text rescan.
    */
  private val docLenSeeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def seededDocLens(spark: SparkSession, dir: String): String =
    docLenSeeds.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_doclen_seed").toString + "/doclens"
      spark.read.parquet(seededPostings(spark, d))
        .groupBy("doc_id").agg(count(lit(1)).as("dl"))
        .write.parquet(p)
      p
    })

  /** BM25 ranked retrieval over the SAME persisted inverted index
    * ([[seededPostings]]) — the scoring companion to
    * `d_posting_search`'s boolean conjunctions. Okapi BM25 (k1=1.2,
    * b=0.75, Lucene's non-negative idf = ln(1 + (N−df+0.5)/(df+0.5))):
    * tf per (doc, term) comes straight from the queried terms' bucket
    * directories (partition pruning + pushed token filter — the corpus
    * text is never rescanned), df per term falls out of the same
    * fetched rows, and dl/avgdl/N come from the doc-length sidecar
    * ([[seededDocLens]]). Top-10 by score lands as
    * TakeOrderedAndProject — scoring work is candidate-docs-sized, the
    * k-row result crosses one boundary. Exact oracle: DuckDB computes
    * the same formula from the raw text; both sides floor-truncate the
    * score at 1e-4 (summation-order ULP guard) and break ties on
    * doc_id.
    */
  private[graft] val bm25Terms = Seq("join", "hash", "scan")

  private def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
    val postings = seededPostings(spark, dir)
    val dl = spark.read.parquet(seededDocLens(spark, dir))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val buckets = bm25Terms.map(termBucket).distinct
    val tf = spark.read.parquet(postings)
      .filter(col("bucket").isin(buckets: _*)
        && col("token").isin(bm25Terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      // operand order AND literal values mirror the oracle SQL exactly:
      // double + and × are not associative, the hash gate compares
      // truncated doubles, and every constant is written as the same
      // parse-time literal on both sides (k1+1 computed at runtime
      // need not equal the parsed literal 2.2 to the last ULP)
      .withColumn("contrib",
        log(lit(1d) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * col("tf") * lit(2.2)
          / (col("tf") + lit(1.2) * (lit(0.25)
            + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg((floor(sum("contrib") * 1e4) / 1e4).as("bm25"))
  }

  private def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25Scored(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)

  private val bm25TopKSql =
    """WITH toks AS (
      |  SELECT doc_id, t.tok AS token
      |  FROM documents, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    x -> x <> '')) AS t(tok)),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
      |  WHERE token IN ('join', 'hash', 'scan') GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
      |SELECT doc_id,
      |  floor(sum(ln(1 + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
      |    * tf * 2.2::DOUBLE
      |    / (tf + 1.2::DOUBLE * (0.25::DOUBLE
      |      + 0.75::DOUBLE * dl / avgdl))) * 1e4) / 1e4 AS bm25
      |FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats
      |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin

  /** Hybrid retrieval with reciprocal-rank fusion — the standard RAG /
    * curation-pipeline shape (Elasticsearch/Vespa "hybrid search"):
    * a LEXICAL leg (BM25 over the persisted posting index, the
    * [[bm25Scored]] machinery) and a VECTOR leg (cosine against one
    * query embedding) each produce a top-20, fused by
    * RRF(d) = Σ_legs 1/(60 + rank_leg(d)) (Cormack et al. SIGIR'09;
    * 60 is the canonical k). Ranks — not scores — are fused, so the
    * two legs' incomparable score scales never meet; a doc missing
    * from one leg contributes 0 for it (FULL OUTER on doc_id).
    *
    * Exactness: each leg's ranking is already hash-stable (BM25
    * floor-truncated at 1e-4, cosine rounded at 1e-4, ties on doc_id),
    * ranks are integers, and the fused score is two IEEE divisions and
    * one addition written in the same operand order on both sides —
    * bit-identical, no rounding needed (the `ev_interpolate` raw-double
    * discipline). Scale shape: each leg is a bounded top-k (the vector
    * leg at 100 TB swaps in the persisted IVF probe, same contract);
    * the rank windows run over ≤20 already-limited rows and the fusion
    * join is result-sized — nothing after the legs touches corpus-sized
    * data.
    */
  private def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val lexRank = bm25Scored(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val q = embs(spark, dir).filter(col("vec_id") === 7)
      .select(col("embedding").as("q_emb"))
    val vecRank = embs(spark, dir).crossJoin(broadcast(q))
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosine_sim(
          col("q_emb"), col("embedding")), 4))
      .orderBy(col("cosine").desc, col("vec_id")).limit(20)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("vec_rank"))
    lexRank.join(vecRank, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf"))
  }

  private val hybridRrfSql =
    """WITH toks AS (
      |  SELECT doc_id, t.tok AS token
      |  FROM documents, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    x -> x <> '')) AS t(tok)),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
      |  WHERE token IN ('join', 'hash', 'scan') GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |lex AS (SELECT doc_id,
      |  floor(sum(ln(1 + (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
      |    * tf * 2.2::DOUBLE
      |    / (tf + 1.2::DOUBLE * (0.25::DOUBLE
      |      + 0.75::DOUBLE * dl / avgdl))) * 1e4) / 1e4 AS bm25
      |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats
      |  GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
      |lexr AS (SELECT doc_id, CAST(row_number() OVER (
      |    ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank FROM lex),
      |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id = 7),
      |vec AS (SELECT e.vec_id AS doc_id,
      |    round(list_cosine_similarity(q.qe,
      |      CAST(e.embedding AS DOUBLE[])), 4) AS cosine
      |  FROM embeddings e, q
      |  ORDER BY cosine DESC, doc_id LIMIT 20),
      |vecr AS (SELECT doc_id, CAST(row_number() OVER (
      |    ORDER BY cosine DESC, doc_id) AS BIGINT) AS vec_rank FROM vec)
      |SELECT doc_id, lex_rank, vec_rank,
      |  coalesce(1.0::DOUBLE / (60 + lex_rank), 0.0::DOUBLE)
      |    + coalesce(1.0::DOUBLE / (60 + vec_rank), 0.0::DOUBLE) AS rrf
      |FROM lexr FULL OUTER JOIN vecr USING (doc_id)
      |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  /** MMR diversified re-ranking over the ANN shortlist
    * ([[Similarity.mmrRerank]]): greedy
    * `λ·rel − (1−λ)·max-sim-to-selected` selection of 5 from each
    * query's top-20 — pure top-k returns near-duplicates; MMR spends
    * slots on coverage (the dedup-aware sample-selection pass).
    * Oracle: the SAME greedy unrolled as chained CTEs (the pagerank
    * discipline — one state/pick CTE pair per step, generated by the
    * same loop bound). λ weights are interpolated from the Scala
    * doubles (`(1.0 - 0.7).toString` = 0.30000000000000004 — writing
    * the decimal 0.3 would diverge by one ULP per step).
    */
  private val mmrK = 5

  private def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val all = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.mmrRerank(all, all.filter(col("id") < 3),
      topN = 20, k = mmrK, lambda = 0.7)
  }

  private val mmrRerankSql = {
    val lam = 0.7.toString
    val oml = (1.0 - 0.7).toString
    def pick(t: Int, from: String): String =
      s"""pick$t AS (
         |  SELECT query_id, id, rel, score,
         |    CAST($t AS BIGINT) AS sel_rank
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, id) AS rn
         |    FROM (SELECT query_id, id, rel, ms,
         |        $lam::DOUBLE * rel - $oml::DOUBLE * ms AS score
         |      FROM $from))
         |  WHERE rn = 1)""".stripMargin
    val steps = (2 to mmrK).map { t =>
      s"""state${t - 1} AS (
         |  SELECT s.query_id, s.id, s.rel, greatest(s.ms, x.sim) AS ms
         |  FROM state${t - 2} s
         |  JOIN pick${t - 1} p ON s.query_id = p.query_id
         |    AND s.id <> p.id
         |  JOIN sims x ON x.query_id = s.query_id AND x.id_a = s.id
         |    AND x.id_b = p.id),
         |${pick(t, s"state${t - 1}")}""".stripMargin
    }.mkString(",\n")
    val unioned = (1 to mmrK).map(t => s"SELECT * FROM pick$t")
      .mkString("\n  UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS query_id,
       |    CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < 3),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS id,
       |    CAST(e.embedding AS DOUBLE[]) AS emb,
       |    round(list_cosine_similarity(q.qe,
       |      CAST(e.embedding AS DOUBLE[])), 4) AS rel
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |cand AS (SELECT query_id, id, emb, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, id) AS rn FROM scored)
       |  WHERE rn <= 20),
       |sims AS (SELECT a.query_id, a.id AS id_a, b.id AS id_b,
       |    round(list_cosine_similarity(a.emb, b.emb), 4) AS sim
       |  FROM cand a JOIN cand b
       |    ON a.query_id = b.query_id AND a.id <> b.id),
       |state0 AS (SELECT query_id, id, rel, 0.0::DOUBLE AS ms FROM cand),
       |${pick(1, "state0")},
       |$steps
       |SELECT query_id, sel_rank, id AS doc_id, rel, score
       |FROM ($unioned)
       |ORDER BY query_id, sel_rank""".stripMargin
  }

  /** Positional phrase search against the SAME persisted posting index
    * ([[seededPostings]] — positions ride in the posting rows): the
    * phrase "hash join" is the two terms' postings self-joined on
    * (doc, position+1). Still only the two terms' bucket directories
    * open; adjacency is an equi join on (doc_id, position), never a
    * text rescan. Exact oracle: DuckDB reconstructs positions from the
    * text with a lateral index unnest and applies the same adjacency.
    */
  private[graft] val phraseTerms = Seq("hash", "join")

  private[graft] def phraseSearch(spark: SparkSession,
      dir: String): DataFrame = {
    val path = seededPostings(spark, dir)
    val buckets = phraseTerms.map(termBucket).distinct
    val postings = spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*)
        && col("token").isin(phraseTerms: _*))
    val a = postings.filter(col("token") === phraseTerms.head)
      .select(col("doc_id"), col("position").as("pa"))
    val b = postings.filter(col("token") === phraseTerms(1))
      .select(col("doc_id"), col("position").as("pb"))
    val matched = a.join(b, a("doc_id") === b("doc_id")
        && col("pb") === col("pa") + 1)
      .select(a("doc_id")).distinct()
    matched.join(docs(spark, dir), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  private val phraseSearchSql =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> x <> '') AS ws
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, ws[i] AS w, i FROM base,
      |    (SELECT unnest(generate_series(1, len(ws))) AS i)),
      |m AS (SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
      |  ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  AND a.w = 'hash' AND b.w = 'join')
      |SELECT d.doc_id, d.lang, d.n_chars
      |FROM m JOIN documents d USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  private def labelStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.dot_f
    embs(spark, dir)
      .withColumn("norm", sqrt(dot_f(col("embedding"), col("embedding"))))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("norm"), 4).as("avg_norm"))
      .orderBy("label")
  }

  private val labelStatsSql =
    """SELECT label, count(*) AS n,
      |  round(avg(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
      |    CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("d_dedup_exact", dedupExact, Some(dedupExactSql)),
    NamedQuery("d_dedup_fingerprint", dedupFingerprint, None),
    NamedQuery("d_passage_dedup", passageDedup, Some(passageDedupSql)),
    NamedQuery("d_incr_minhash", incrMinhash, None),
    NamedQuery("d_incr_dedup", incrDedup, Some(incrDedupSql)),
    NamedQuery("d_jaccard_pairs", jaccardPairs, Some(jaccardPairsSql)),
    NamedQuery("d_jaccard_capped", jaccardCapped, Some(jaccardCappedSql)),
    NamedQuery("d_ppjoin_pairs", ppjoinPairs, Some(ppjoinPairsSql)),
    NamedQuery("d_minhash_pairs", minhashPairs, None),
    NamedQuery("d_minhash_capped", minhashCapped, None),
    NamedQuery("d_simhash_pairs", simhashPairs, None),
    NamedQuery("d_winnow_pairs", winnowPairs, None),
    NamedQuery("d_repetition_stats", repetitionStats,
      Some(repetitionStatsSql)),
    NamedQuery("d_text_stats", textStats, Some(textStatsSql)),
    NamedQuery("d_collapse_repeats", collapseRepeatsQ,
      Some(collapseRepeatsSql)),
    NamedQuery("d_lang_id", langId, Some(langIdSql)),
    NamedQuery("d_bpe_merges", bpeMerges, None),
    NamedQuery("d_bpe_exact", bpeExact, None),
    NamedQuery("d_bpe_encode", bpeEncode, None),
    NamedQuery("d_token_topk", tokenTopK, Some(tokenTopKSql)),
    NamedQuery("d_phrase_mine", phraseMine, Some(phraseMineSql)),
    NamedQuery("d_vocab_coverage", vocabCoverage, Some(vocabCoverageSql)),
    NamedQuery("d_token_topk_approx", tokenTopKApprox, None),
    NamedQuery("d_clean_pipeline", cleanPipeline, Some(cleanPipelineSql)),
    NamedQuery("e_ann_topk", annTopK, Some(annTopKSql)),
    NamedQuery("e_ann_filtered", annFiltered, Some(annFilteredSql)),
    NamedQuery("e_ann_topk_agg", annTopKAgg, Some(annTopKSql)),
    NamedQuery("e_neardup_pairs", nearDupEmbeddings, Some(nearDupEmbeddingsSql)),
    NamedQuery("e_semdedup_pairs", semDedup, None),
    NamedQuery("e_dup_clusters", dupClusters, Some(dupClustersSql)),
    NamedQuery("e_cluster_reps", clusterRepresentatives,
      Some(clusterRepresentativesSql)),
    NamedQuery("e_sq8_topk", sq8TopK, Some(annTopKSql)),
    NamedQuery("e_pq_topk", pqTopKQ, Some(annTopKSql)),
    NamedQuery("e_ivfpq_topk", ivfPqTopK, None),
    NamedQuery("g_triangles", dupTriangles, Some(dupTrianglesSql)),
    NamedQuery("g_clustering", dupClustering, Some(dupClusteringSql)),
    NamedQuery("d_posting_search", postingSearch, Some(postingSearchSql)),
    NamedQuery("st_posting_maint", postingMaintViaStream,
      Some(postingSearchSql)),
    NamedQuery("d_phrase_search", phraseSearch, Some(phraseSearchSql)),
    NamedQuery("d_bm25_topk", bm25TopK, Some(bm25TopKSql)),
    NamedQuery("d_hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    NamedQuery("e_mmr_rerank", mmrRerank, Some(mmrRerankSql)),
    NamedQuery("e_contrastive_batches", contrastiveBatches,
      Some(contrastiveBatchesSql)),
    NamedQuery("e_cluster_split", clusterSplit, Some(clusterSplitSql)),
    NamedQuery("e_lsh_topk", lshTopK, None),
    NamedQuery("e_ivf_topk", ivfTopK, None),
    NamedQuery("e_ivf_persisted", ivfPersisted, None),
    NamedQuery("st_ivf_maint", ivfMaintViaStream, None),
    NamedQuery("e_knn_exact", knnExact, Some(knnExactSql)),
    NamedQuery("e_knn_graph", knnGraph, None),
    NamedQuery("e_label_stats", labelStats, Some(labelStatsSql)),
    NamedQuery("d_nfc_dedup", nfcDedup, Some(nfcDedupSql)))
}
