package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines, composed from
  * codegen'd built-ins only (no UDFs) so the whole pipeline stays inside
  * WholeStageCodegen and each has an exact SQL oracle.
  *
  * Tokenization contract (shared with every oracle): tokens are maximal
  * NON-EMPTY runs of non-whitespace in `lower(trim(text))`, i.e.
  * `split(lower(trim(text)), '\\s+')` with empty strings removed (split
  * yields `[""]` on blank input); blank input → 0 tokens. Oracle SQLs
  * filter `token <> ''` to match.
  */
object TextAnalysis {

  /** `split` on blank input yields `[""]`, not `[]` — strip the empty
    * string so the documented blank → 0 tokens contract actually holds
    * (otherwise every blank doc shares the `""` token and
    * `size(toks) > 0` guards never fire).
    */
  def tokens(text: Column): Column =
    array_remove(split(lower(trim(text)), "\\s+"), "")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(tokens(text)).cast("bigint"))

  /** Collapse CONSECUTIVE duplicate tokens ("a a the the" → "a the") —
    * the cheap intra-document repetition scrub that fixes the most
    * common LM-corpus degeneracy (stutter from scrapers and generation
    * loops) without touching legitimate long-range repetition. Pure
    * higher-order functions, fully codegen'd, zero shuffles — the kind
    * of per-row rewrite that runs at scan speed over 100 TB. Keeps the
    * FIRST token of each run (`get` is 0-based and null out-of-bounds,
    * so the coalesce admits index 0).
    */
  def collapseRepeats(words: Column): Column =
    filter(words, (w, i) => coalesce(w =!= get(words, i - 1), lit(true)))

  /** BPE-ish token count: word pieces + isolated punctuation
    * (`\w+|[^\w\s]` matches), the usual pre-tokenizer shape.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]")).cast("bigint")

  /** Fraction of characters that are neither word chars nor whitespace. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[^\\w\\s]", "")))
        .cast("double") / length(text))

  /** English stopwords per the heuristic spec (tiny fixed list — the
    * contract is determinism, not linguistic coverage).
    */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Distinct-stopword hit ratio: |distinct tokens ∩ stopwords| /
    * |distinct tokens|.
    */
  def stopwordRatio(text: Column,
      stopwords: Seq[String] = stopwordsEn): Column = {
    val distinctToks = array_distinct(tokens(text))
    when(size(distinctToks) === 0, lit(0.0)).otherwise(
      size(array_intersect(distinctToks, lit(stopwords.toArray)))
        .cast("double") / size(distinctToks))
  }

  /** Deterministic quality score in [0,1]: length saturation (40%),
    * low punctuation (30%), stopword presence (30%).
    *
    * Truncated (floor-scaled) to 4 digits rather than round(): floor of
    * a double is a pure IEEE operation, bit-identical in every engine,
    * while round-to-decimal differs between engines exactly on half
    * boundaries (DuckDB rounded a true 0.43475 up where JVM BigDecimal
    * of the nearest double 0.43474999... rounds down — a real sf0.001
    * oracle mismatch).
    */
  def qualityScore(text: Column): Column =
    floor((least(tokenCount(text).cast("double") / 100, lit(1.0)) * 0.4
      + (lit(1.0) - punctRatio(text)) * 0.3
      + stopwordRatio(text) * 0.3) * 10000) / 10000

  /** Stopword sets per language for the n-gram/stopword lang-ID
    * heuristic. Score(lang) = |distinct tokens ∩ set(lang)|; prediction
    * = argmax, ties broken by language-code order. 'und' when all
    * scores are 0.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "和"))

  def langScore(text: Column, lang: String): Column = {
    val words = langStopwords.toMap.apply(lang)
    size(array_intersect(array_distinct(tokens(text)), lit(words.toArray)))
      .cast("bigint")
  }

  /** Heuristic language ID over the stopword sets (spec above). */
  def langId(text: Column): Column = {
    val scores = langStopwords.map { case (l, _) => l -> langScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // nested WHENs check languages in code order, so the first language
    // reaching the max wins ties deterministically
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }
}
