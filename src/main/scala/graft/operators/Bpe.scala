package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-rule training (Sennrich et al. 2016,
  * arXiv:1508.07909) — the vocabulary-learning half of the tokenizer a
  * training-data pipeline ships (the counting half is
  * [[graft.functions.TextAnalysis]]). Classic word-frequency BPE: the
  * corpus collapses ONCE to a (word, count) table, and every merge
  * round runs over that vocabulary-bounded relation — at 100 TB the
  * corpus scan happens once, then each of the k rounds is a
  * vocab-sized pair-count shuffle plus a one-row driver argmax, the
  * pagerank cost shape (k small jobs), never a corpus rescan.
  *
  * Determinism contract (what makes the exact driver twin an oracle):
  * pair selection is max count, ties to the lexicographically smallest
  * (left, right); merge application is left-to-right non-overlapping,
  * expressed as a fold that joins the current symbol onto the
  * accumulator's tail when the tail matches — a freshly merged symbol
  * is strictly longer than either part, so it can never re-match its
  * own round's pair and the fold IS the textbook scan.
  */
object Bpe {

  /** Corpus → (word, n) on lowercase `[a-z]+` tokens — the one
    * corpus-sized pass; everything after is vocabulary-bounded.
    */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(expr(
      s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Adjacent symbol pairs of `syms` as (l, r) structs. */
  private def adjacentPairs(syms: Column): Column =
    expr("transform(slice(syms, 1, size(syms) - 1), " +
      "(x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))")

  /** Left-to-right non-overlapping application of one merge rule:
    * append each symbol, fusing it onto the accumulator tail when
    * (tail, symbol) = (left, right). Symbols are `[a-z]+`, safe to
    * embed in the expression text.
    */
  private def applyMerge(left: String, right: String): Column =
    expr(s"""aggregate(syms, cast(array() AS array<string>),
      (acc, x) -> CASE WHEN size(acc) > 0
          AND element_at(acc, -1) = '$left' AND x = '$right'
        THEN concat(slice(acc, 1, size(acc) - 1), array('$left$right'))
        ELSE concat(acc, array(x)) END)""")

  /** Learn `numMerges` merge rules; returns (rank, left, right,
    * pair_count) ordered by rank. Stops early when no adjacent pair
    * remains (fully merged vocabulary).
    */
  def train(words: DataFrame, numMerges: Int): DataFrame = {
    val spark = words.sparkSession
    // per-round localCheckpoint: k rounds of withColumn would build a
    // k-deep lineage re-executing every prior merge per action (the
    // pagerank discipline, measured there). LAZY (r15, guide §1.2
    // per-task work): the very next argmax is a full-shuffle job over
    // this frame, so it materializes the checkpoint as a side effect —
    // eager ran a SECOND job per round just to persist, and the final
    // round's merge apply (which nothing reads) was materialized for
    // nothing
    // NB Spark's split keeps trailing empties (limit = -1), so the
    // lookahead char-split emits a final '' — filtered, matching the
    // driver twin's per-char split exactly
    var cur = words
      .select(col("n"),
        expr("filter(split(word, '(?!^)'), x -> x <> '')").as("syms"))
      .localCheckpoint(false)
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = cur
        .select(col("n"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      top.headOption match {
        case None => exhausted = true
        case Some(Row(l: String, r: String, cnt: Long)) =>
          merges += ((rank, l, r, cnt))
          cur = cur.select(col("n"),
            applyMerge(l, r).as("syms")).localCheckpoint(false)
          rank += 1
        case Some(other) => sys.error(s"unexpected pair row $other")
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }

  /** True BPE inference on one word: repeatedly merge the adjacent
    * pair with the LOWEST learned rank until none applies — the
    * tokenizer-side algorithm (rank-greedy, NOT left-to-right: rank
    * order is what training's merge sequence means). Position ties
    * take the leftmost occurrence. Pure function — the same code runs
    * executor-side in [[encode]] and driver-side in the twin, so the
    * two can only agree or both be wrong in the same way.
    */
  def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Tokenize a text column under learned merge rules: per-document
    * (doc token count, char count). The rank table broadcasts
    * (vocab-bounded); the rank-greedy per-word loop runs in
    * `mapPartitions` with a per-partition word cache — the sanctioned
    * seam for iterative per-record algorithms no Catalyst `Expression`
    * expresses (the multimodal-codec / Misra-Gries precedent; §2.9:
    * this is NOT a `udf()`), and the cache exploits word repetition so
    * each distinct word per partition tokenizes once.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val bRanks = spark.sparkContext.broadcast(ranks)
    import spark.implicits._
    val words = df.select(col(idCol).cast("long").as("id"),
      expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)").as("ws"))
      .as[(Long, Seq[String])]
    words.mapPartitions { it =>
      val cache = collection.mutable.HashMap.empty[String, Int]
      val r = bRanks.value
      it.map { case (id, ws) =>
        var toks = 0L; var chars = 0L
        ws.foreach { w =>
          toks += cache.getOrElseUpdate(w, encodeWord(w, r).length)
          chars += w.length
        }
        (id, toks, chars)
      }
    }.toDF("doc_id", "n_tokens", "n_chars")
  }

  /** The exact driver-side twin of [[train]] — same tokenization, same
    * tie-breaks, same scan — run on the collected word-frequency
    * table. The oracle anchor for ToleranceCheck (sequence equality
    * required); driver-sized by the vocabulary bound.
    */
  def trainExact(spark: SparkSession, wordFreq: Seq[(String, Long)],
      numMerges: Int): DataFrame = {
    var words = wordFreq.map { case (w, n) =>
      (w.map(_.toString).toVector, n) }
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ => ()
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, l, r, cnt))
        words = words.map { case (syms, n) =>
          val out = ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (out.nonEmpty && out.last == l && x == r)
              out(out.length - 1) = l + r
            else out += x
          }
          (out.toVector, n)
        }
        rank += 1
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }
}
