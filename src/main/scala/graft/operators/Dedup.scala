package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{fnv1a64, hamming64, simhash64, word_ngrams}
import graft.functions.TextAnalysis.tokens

/** Deduplication operators for training-data pipelines (builder-prompt
  * extension surface). All operate on an (id, text) pair of columns and
  * return either survivor sets or candidate duplicate pairs
  * `(id_a < id_b)`.
  *
  * Scale design: nothing here ever compares all O(n²) pairs. Exact and
  * fingerprint dedup are single hash-shuffles on the key; MinHash/LSH
  * and SimHash generate candidates by bucket join (shuffle on
  * band/bucket key), so cost tracks the number of *colliding* pairs,
  * not n². Skewed buckets (a shingle shared by every doc, an all-zeros
  * band) are the known hazard — AQE skew-join handles moderate cases;
  * pathological hot shingles should be length-filtered upstream.
  */
object Dedup {

  /** Canonical word-set key: distinct sorted tokens re-joined. Detects
    * reorder/repeat duplicates of the same vocabulary (bag-of-words
    * identity) — one deterministic string key, one shuffle to dedup.
    */
  def wordSetKey(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(array_sort(array_distinct(tokens(text))), " ")

  /** Exact dedup on an arbitrary key: one group per key, smallest id
    * survives. `dropDuplicates` would also work but picks an arbitrary
    * survivor; min(id) is deterministic (required by the oracle gate).
    */
  def exactDedup(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol).as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** 64-bit fingerprint dedup: same as exact but on fnv1a64(key) —
    * constant-width keys, cheap shuffles at 100 TB (8-byte vs
    * arbitrary-length text keys).
    */
  def fingerprintDedup(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.withColumn("fp", fnv1a64(col(keyCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct word n-grams per document, the shared shingle builder for
    * the similarity joins: `(id, grams array<string>)`. n=1 → the plain
    * distinct token set; n>1 → space-joined n-gram shingles; fewer than
    * n tokens → empty array. One codegen'd pass per row
    * ([[graft.expressions.WordNGrams]]) — the equivalent
    * `transform(sequence, slice, array_join)` composition evaluates
    * interpreted per element and re-tokenizes per slice (O(len²) per
    * row), which dominated the whole family's runtime before this
    * expression existed.
    */
  private def distinctGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      word_ngrams(col(textCol), n).as("grams"))

  /** MinHash+LSH near-dup candidate pairs via spark.ml (shingle → term
    * hashing → minhash signatures → banded bucket join inside
    * `approxSimilarityJoin`). Deterministic for a fixed seed.
    *
    * @param threshold minimum estimated Jaccard similarity to keep.
    * @param n shingle width: 1 = word sets; ≥2 = word n-grams — the
    *          scale setting, since n-gram document frequencies are far
    *          more selective than single-word ones (candidates track
    *          genuine near-dups, not shared vocabulary).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      numHashTables: Int = 8, threshold: Double = 0.5,
      seed: Long = 42L, maxDf: Double = 1.0, n: Int = 1): DataFrame = {
    val rawToks = distinctGrams(df, idCol, textCol, n)
      .withColumnRenamed("grams", "toks")
      .filter(size(col("toks")) > 0)
    val toks =
      if (maxDf >= 1.0) rawToks
      else {
        // stop-shingle cap via the shared anti-join filter (never a
        // driver-side collect of the hot list); denominator = ALL input
        // docs, same as jaccardPairs — one maxDf meaning everywhere
        val exploded = rawToks.select(col("id"), explode(col("toks")).as("t"))
        dropHotTerms(exploded, "t", maxDf,
          df.select(col(idCol)).distinct().count())
          .groupBy("id").agg(collect_list("t").as("toks"))
      }
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(1 << 18)
    val featured = tf.transform(toks)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(featured)
    // approxSimilarityJoin keeps dist STRICTLY below the cutoff; widen
    // by an epsilon so pairs at exactly `threshold` survive, then apply
    // the documented est_jaccard >= threshold contract precisely (the
    // widened radius is join-internal only — no epsilon in the final
    // predicate, so nothing below the threshold leaks through).
    model.approxSimilarityJoin(featured, featured,
        1.0 - threshold + 1e-9, "dist")
      .filter(col("datasetA.id") < col("datasetB.id"))
      .filter(lit(1.0) - col("dist") >= threshold)
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        round(lit(1.0) - col("dist"), 4).as("est_jaccard"))
  }

  /** Stop-term cap shared by the similarity operators: drop terms whose
    * document frequency exceeds `maxDf` × `nDocs`. The caller supplies
    * the denominator (its corpus size, already known there — no extra
    * distinct-count pass). Anti-join against the (small) hot-term set —
    * never a driver-side collect, never an in-plan literal array.
    */
  private def dropHotTerms(exploded: DataFrame, termCol: String,
      maxDf: Double, nDocs: Long): DataFrame = {
    val hot = exploded.groupBy(termCol)
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf * nDocs)
      .select(termCol)
    exploded.join(broadcast(hot), Seq(termCol), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit signature per doc, banded into
    * `bands` sub-keys; docs sharing any band become candidates
    * (bucket join, no n²), then exact Hamming distance filters.
    * A pair within `maxHamming` of 64-bit distance must agree on at
    * least one band when `maxHamming < bands` (pigeonhole).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands " +
        s"(got maxHamming=$maxHamming, bands=$bands): a pair $maxHamming " +
        "bits apart could differ in every band and never become a candidate")
    val width = 64 / bands
    // 1L << 64 wraps to 1 on the JVM — width 64 (bands=1, unreachable
    // with the require above but kept correct) needs the -1L mask
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sigs = df.select(col(idCol).as("id"),
      simhash64(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * width)
            .bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("bk").as("k"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("bk").as("k"))
    a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity join: explode distinct n-grams,
    * join on the shingle (candidates = co-occurring pairs only), count
    * intersections, filter by true Jaccard. n=1 → word-set Jaccard.
    *
    * `maxDf` < 1.0 enables the scale path: shingles present in more
    * than that fraction of documents are dropped before the join
    * (standard stop-shingle filtering) and Jaccard is computed over the
    * surviving shingles. A shingle shared by every document would
    * otherwise make the candidate join quadratic in corpus size — with
    * the cap, join cost tracks the rare-shingle collision count.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 1, threshold: Double = 0.6,
      maxDf: Double = 1.0): DataFrame = {
    val grams = distinctGrams(df, idCol, textCol, n)
    // per-doc gram count travels WITH the rows from before the explode —
    // a plain projection, where a window count after the explode would
    // re-shuffle the entire exploded relation
    val exploded = grams.filter(size(col("grams")) > 0)
      .select(col("id"), size(col("grams")).cast("bigint").as("sz"),
        explode(col("grams")).as("g"))
    val sized =
      if (maxDf >= 1.0) exploded
      else {
        // denominator = ALL input docs (the documented maxDf meaning),
        // not just docs that produced grams
        val nDocs = df.select(col(idCol)).distinct().count()
        // the cap changes each doc's surviving-gram count: regroup the
        // anti-joined relation once and re-explode with its new size —
        // a single evaluation of the tokenize/anti-join subtree, no
        // self-join and no persist to leak
        dropHotTerms(exploded.drop("sz"), "g", maxDf, nDocs)
          .groupBy("id").agg(collect_list("g").as("gs"))
          .select(col("id"), size(col("gs")).cast("bigint").as("sz"),
            explode(col("gs")).as("g"))
      }
    val a = sized.select(col("id").as("id_a"), col("sz").as("sz_a"), col("g"))
    val b = sized.select(col("id").as("id_b"), col("sz").as("sz_b"), col("g"))
    a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
