package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace runs, trim, blank → 0") {
    val out = Seq("a b  c", "  x ", "", "   ").toDF("t")
      .select(TextAnalysis.tokenCount(col("t"))).as[Long].collect().toSeq
    assert(out == Seq(3L, 1L, 0L, 0L))
  }

  test("tokens yields an empty array for blank text, not [\"\"]") {
    val out = Seq("", "   ", "a b").toDF("t")
      .select(size(TextAnalysis.tokens(col("t")))).as[Int].collect().toSeq
    assert(out == Seq(0, 0, 2))
  }

  test("regexTokenCount counts word pieces and punctuation") {
    val out = Seq("ab, cd!", "hello", "").toDF("t")
      .select(TextAnalysis.regexTokenCount(col("t"))).as[Long].collect().toSeq
    assert(out == Seq(4L, 1L, 0L)) // ab , cd !
  }

  test("punctRatio counts non-word non-space chars") {
    val out = Seq("ab!?", "abcd", "").toDF("t")
      .select(round(TextAnalysis.punctRatio(col("t")), 4))
      .as[Double].collect().toSeq
    assert(out == Seq(0.5, 0.0, 0.0))
  }

  test("stopwordRatio uses distinct tokens") {
    val out = Seq("the the the fox", "fox wolf").toDF("t")
      .select(round(TextAnalysis.stopwordRatio(col("t")), 4))
      .as[Double].collect().toSeq
    assert(out == Seq(0.5, 0.0)) // {the, fox}: 1 of 2; {fox, wolf}: 0 of 2
  }

  test("langId picks the language with most stopword hits, 'und' when none") {
    val out = Seq(
      "the cat is in the house and it sleeps",
      "der hund und die katze ist nicht hier",
      "el perro y la casa es un lugar",
      "le chat est dans la maison et le jardin",
      "的 了 是 我 something",
      "xyzzy plugh qwerty").toDF("t")
      .select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(out == Seq("en", "de", "es", "fr", "zh", "und"))
  }

  test("langId tie-break is deterministic (language-code order)") {
    // 'la' ∈ es and fr sets only → tie between es and fr → es wins (code order)
    val out = Seq("la").toDF("t")
      .select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(out(0) == "es")
  }

  test("collapseRepeats keeps the first token of each run, is " +
      "idempotent, and preserves non-adjacent repeats") {
    def collapse(s: String): String = Seq(s).toDF("t")
      .select(concat_ws(" ", TextAnalysis.collapseRepeats(
        array_remove(split(col("t"), "\\s+"), ""))))
      .as[String].collect()(0)
    assert(collapse("a a the the the b") == "a the b")
    assert(collapse("a b a b") == "a b a b")       // long-range untouched
    assert(collapse("x") == "x")
    assert(collapse("x x x x x x") == "x")
    assert(collapse(collapse("go go stop stop go")) ==
      collapse("go go stop stop go"))              // idempotent
  }

  test("qualityScore is in [0,1] and rewards clean prose") {
    val clean = "the quick brown fox jumps over a lazy dog and it is fine " * 3
    val junk = "$$$ ### !!! ??? %%% ^^^ &&& *** ((( )))"
    val out = Seq(clean, junk).toDF("t")
      .select(TextAnalysis.qualityScore(col("t"))).as[Double].collect()
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
    assert(out(0) > out(1))
  }
}
