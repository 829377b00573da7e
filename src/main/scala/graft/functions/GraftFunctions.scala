package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.{call_function, lit}

import graft.expressions._

/** Column-level facade over the custom Catalyst expressions, plus SQL
  * registration. The wrappers resolve through the function registry
  * (`call_function` — the public Column↔Expression bridge), so the
  * session must carry [[GraftExtensions]] (`Tables.configure` does) or
  * have had [[GraftFunctions.register]] called.
  *
  * {{{
  * import graft.functions.GraftFunctions._
  * docs.withColumn("fp", fnv1a64(lower($"text")))
  * }}}
  */
object GraftFunctions {
  def fnv1a64(col: Column): Column = call_function("fnv1a64", col)
  def nfc_normalize(col: Column): Column =
    call_function("nfc_normalize", col)
  def simhash64(col: Column): Column = call_function("simhash64", col)
  def hamming64(l: Column, r: Column): Column =
    call_function("hamming64", l, r)
  def cosine_sim(l: Column, r: Column): Column =
    call_function("cosine_sim", l, r)
  def bitmap_cardinality(col: Column): Column =
    call_function("bitmap_cardinality", col)
  def bitmap_and_cardinality(l: Column, r: Column): Column =
    call_function("bitmap_and_cardinality", l, r)
  def dot_f(l: Column, r: Column): Column = call_function("dot_f", l, r)
  def srp_bucket(col: Column, numBits: Int, seed: Long): Column =
    call_function("srp_bucket", col, lit(numBits), lit(seed))
  def srp_probes(col: Column, numBits: Int, seed: Long, nProbes: Int): Column =
    call_function("srp_probes", col, lit(numBits), lit(seed), lit(nProbes))
  def word_ngrams(col: Column, n: Int): Column =
    call_function("word_ngrams", col, lit(n))
  def sq8_quantize(col: Column): Column = call_function("sq8_quantize", col)
  def minhash_sigs(col: Column, numTables: Int, seed: Long): Column =
    call_function("minhash_sigs", col, lit(numTables), lit(seed))
  def winnow_fingerprints(col: Column, k: Int, w: Int): Column =
    call_function("winnow_fingerprints", col, lit(k), lit(w))
  def char_gram_hashes(col: Column, k: Int): Column =
    call_function("char_gram_hashes", col, lit(k))
  def range_bucket(col: Column, bounds: Array[Double]): Column =
    call_function("range_bucket", col, lit(bounds))
  def sq8_cosine(l: Column, r: Column): Column =
    call_function("sq8_cosine", l, r)
  def pq_encode(c: Column, codebooks: Array[Float], m: Int, k: Int): Column =
    call_function("pq_encode", c, lit(codebooks), lit(m), lit(k))
  def ivf_cell(c: Column, centroids: Array[Float], k: Int): Column =
    call_function("ivf_cell", c, lit(centroids), lit(k))
  def pq_adc_table(c: Column, codebooks: Array[Float], m: Int,
      k: Int): Column =
    call_function("pq_adc_table", c, lit(codebooks), lit(m), lit(k))
  def pq_adc(table: Column, code: Column): Column =
    call_function("pq_adc", table, code)
  /** Bloom sketch over xxhash64 of a column — Spark's own
    * `BloomFilterAggregate` (the runtime-filter machinery), surfaced
    * as a registered function so data-level membership prefilters can
    * build the same sketch the optimizer uses. `numBits` sets the
    * false-positive rate (bits ≈ 30× items → fpp ≈ 1e-6).
    */
  def bloom_agg(c: Column, items: Long, numBits: Long): Column =
    call_function("bloom_agg", c, lit(items), lit(numBits))
  /** Membership probe against a collected sketch (binary literal —
    * `BloomFilterMightContain` requires a constant/scalar-subquery
    * bloom side). No false negatives; false positives at the sketch's
    * fpp.
    */
  def bloom_might_contain(bloom: Array[Byte], c: Column): Column =
    call_function("bloom_might_contain", lit(bloom), c)

  /** srp_bucket(v, numBits, seed) — numBits/seed must be foldable ints. */
  private def srpBuilder(es: Seq[Expression]): Expression =
    SrpBucket(es.head,
      es(1).eval(null).asInstanceOf[Number].intValue(),
      es(2).eval(null).asInstanceOf[Number].longValue())

  /** srp_probes(v, numBits, seed, nProbes) — scalars must be foldable. */
  private def srpProbesBuilder(es: Seq[Expression]): Expression =
    SrpProbes(es.head,
      es(1).eval(null).asInstanceOf[Number].intValue(),
      es(2).eval(null).asInstanceOf[Number].longValue(),
      es(3).eval(null).asInstanceOf[Number].intValue())

  /** word_ngrams(text, n) — n must be a foldable int. */
  private def ngramsBuilder(es: Seq[Expression]): Expression =
    WordNGrams(es.head, es(1).eval(null).asInstanceOf[Number].intValue())

  private[graft] val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "fnv1a64" -> (es => Fnv1a64(es.head)),
      "nfc_normalize" -> (es => NfcNormalize(es.head)),
      "simhash64" -> (es => SimHash64(es.head)),
      "hamming64" -> (es => HammingDistance(es.head, es(1))),
      "cosine_sim" -> (es => CosineSim(es.head, es(1))),
      "bitmap_cardinality" -> (es => BitmapCardinality(es.head)),
      "bitmap_and_cardinality" ->
        (es => BitmapAndCardinality(es.head, es(1))),
      "dot_f" -> (es => DotF(es.head, es(1))),
      "srp_bucket" -> srpBuilder,
      "srp_probes" -> srpProbesBuilder,
      "word_ngrams" -> ngramsBuilder,
      "sq8_quantize" -> (es => Sq8Quantize(es.head)),
      "minhash_sigs" -> (es => MinHashSigs(es.head,
        es(1).eval(null).asInstanceOf[Number].intValue(),
        es(2).eval(null).asInstanceOf[Number].longValue())),
      "sq8_cosine" -> (es => Sq8Cosine(es.head, es(1))),
      "pq_encode" -> (es => PqEncode(es.head,
        es(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toFloatArray(),
        es(2).eval(null).asInstanceOf[Number].intValue(),
        es(3).eval(null).asInstanceOf[Number].intValue())),
      "ivf_cell" -> (es => IvfCell(es.head,
        es(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toFloatArray(),
        es(2).eval(null).asInstanceOf[Number].intValue())),
      "pq_adc_table" -> (es => PqAdcTable(es.head,
        es(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toFloatArray(),
        es(2).eval(null).asInstanceOf[Number].intValue(),
        es(3).eval(null).asInstanceOf[Number].intValue())),
      "pq_adc" -> (es => PqAdc(es.head, es(1))),
      "winnow_fingerprints" -> (es => WinnowFingerprints(es.head,
        es(1).eval(null).asInstanceOf[Number].intValue(),
        es(2).eval(null).asInstanceOf[Number].intValue())),
      "char_gram_hashes" -> (es => CharGramHashes(es.head,
        es(1).eval(null).asInstanceOf[Number].intValue())),
      "range_bucket" -> (es => RangeBucket(es.head,
        es(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray())),
      // Spark's own runtime-filter expressions, reused at the data
      // level; values hash through XxHash64 on both sides
      "bloom_agg" -> (es =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
            org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(es.head), 42L),
            es(1), es(2))),
      "bloom_might_contain" -> (es =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          es.head,
          org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(es(1)), 42L))))

  /** Make the functions available to `spark.sql` in an existing session. */
  def register(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** `SparkSessionExtensions` hook — the public registration path:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[Fnv1a64].getName, name), builder))
    }
    // aggregate navigation (no-op until a summary table is registered
    // in graft.plans.SummaryCatalog)
    ext.injectOptimizerRule(graft.plans.SummaryRewrite(_))
    // approximation governor (no-op until the session opts in via
    // spark.graft.approx.countDistinct=true)
    ext.injectOptimizerRule(graft.plans.ApproxGovernorRule(_))
    // row-level security + column masking (no-op until a policy is
    // registered in graft.plans.AccessPolicyCatalog)
    ext.injectOptimizerRule(graft.plans.AccessPolicyRule(_))
    // whole-operator as-of join: plans graft.plans.AsOfJoin nodes into
    // the sort-merge AsOfJoinExec; a no-op on every other plan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // query guardrail (no-op until the session opts in via
    // spark.graft.guardrail.enabled=true): rejects unconditioned
    // large-by-large joins at plan time
    ext.injectOptimizerRule(graft.plans.GuardrailRule(_))
  }
}
