package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("Sennrich example: counts rule, lexicographic ties, merged " +
    "symbols feed later rounds") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "n")
    val m = rows(Bpe.train(words, 5))
    // (e,s) and (s,t) both count 9 -> lexicographic smallest first;
    // the merged 'es' then pairs with 't' at the same count
    assert(m(0) === ((1, "e", "s", 9L)))
    assert(m(1) === ((2, "es", "t", 9L)))
    // (l,o) and (o,w) tie at 7 -> 'l' < 'o'
    assert(m(2) === ((3, "l", "o", 7L)))
    assert(m(3) === ((4, "lo", "w", 7L)))
    // 6-count tie (e,w)/(n,e)/(w,est) -> (e,w)
    assert(m(4) === ((5, "e", "w", 6L)))
  }

  test("distributed == exact driver twin on a mixed corpus") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quicker brown foxes jumped over lazy dogs",
      "pack my box with five dozen liquor jugs",
      "the five boxing wizards jump quickly").toDF("text")
    val wf = Bpe.wordFreq(docs, "text")
    val dist = rows(Bpe.train(wf, 15))
    val exact = rows(Bpe.trainExact(spark,
      wf.as[(String, Long)].collect().toSeq, 15))
    assert(dist === exact)
    assert(dist.size === 15)
  }

  test("selected pair counts never increase across ranks (a created " +
    "symbol's pairs are bounded by its own merge count)") {
    val docs = Seq("aa ab abc abcd abcde banana bandana cabana").toDF("text")
    val m = rows(Bpe.train(Bpe.wordFreq(docs, "text"), 10))
    val counts = m.map(_._4)
    assert(counts === counts.sorted.reverse,
      s"merge counts must be non-increasing, got $counts")
  }

  test("training stops early when the vocabulary is fully merged") {
    val words = Seq(("ab", 3L)).toDF("word", "n")
    val m = rows(Bpe.train(words, 5))
    assert(m === Seq((1, "a", "b", 3L)))
  }

  test("encodeWord is rank-greedy, not left-to-right, and always " +
    "round-trips") {
    // lowest rank wins even when a higher-rank pair sits further left
    val ranks = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(Bpe.encodeWord("abc", ranks) === Vector("a", "bc"))
    // with the priorities flipped, left-to-right and greedy agree
    assert(Bpe.encodeWord("abc",
      Map(("a", "b") -> 0, ("b", "c") -> 1)) === Vector("ab", "c"))
    // position ties take the leftmost occurrence
    assert(Bpe.encodeWord("abab", Map(("a", "b") -> 0))
      === Vector("ab", "ab"))
    // round-trip: concatenating tokens always restores the word
    for (w <- Seq("banana", "mississippi", "xyzzy", "a", ""))
      assert(Bpe.encodeWord(w, ranks).mkString === w)
  }

  test("distributed encode equals the per-word function, doc by doc") {
    val docs = Seq(
      (1L, "the newest lower tower"),
      (2L, "low wide west"),
      (3L, "")).toDF("doc_id", "text")
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val ranks = merges.zipWithIndex.toMap
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    def count(text: String): (Long, Long) = {
      val ws = "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
      (ws.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum,
        ws.map(_.length.toLong).sum)
    }
    assert(got === Map(
      1L -> count("the newest lower tower"),
      2L -> count("low wide west"),
      3L -> ((0L, 0L))))
  }
}
