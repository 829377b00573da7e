package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Laws of the plan-time guardrail: large-by-large unconditioned joins
  * reject with an explainable message, broadcast-band patterns and
  * conditioned joins stay legal, and the flag defaults off.
  */
class GuardrailSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** sf0.001 tables are all below the production 64 MB small-side
    * default, so the spec scales the threshold down to make them
    * "large" relative to it.
    */
  private def withGuardrail[T](smallBytes: Long = 1024)(body: => T): T = {
    spark.conf.set("spark.graft.guardrail.enabled", "true")
    spark.conf.set("spark.graft.guardrail.maxBroadcastableBytes",
      smallBytes.toString)
    try body finally {
      spark.conf.unset("spark.graft.guardrail.enabled")
      spark.conf.unset("spark.graft.guardrail.maxBroadcastableBytes")
    }
  }

  test("unconditioned large-by-large cross join rejects at plan time") {
    val a = graft.queries.Tables(spark, sf, "lineitem")
    val b = graft.queries.Tables(spark, sf, "orders")
    withGuardrail() {
      val e = intercept[Exception] {
        a.crossJoin(b).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("graft guardrail")), e.toString)
    }
    // flag off (default): same plan runs
    assert(a.limit(3).crossJoin(b.limit(3)).count() == 9)
  }

  test("broadcast-band pattern (tiny side) and conditioned joins pass") {
    val fact = graft.queries.Tables(spark, sf, "lineitem")
    val dim = Seq((0.0, 10.0, "low"), (10.0, 100.0, "high"))
      .toDF("lo", "hi", "band")
    // dim is ~100 bytes: below even a 4 KB small-side threshold
    withGuardrail(4096) {
      // tiny-side unconditioned (range predicate applied post-join by
      // Catalyst) — the ev_value_bands shape — stays legal
      val n = fact.join(dim,
        fact("l_quantity") >= dim("lo") && fact("l_quantity") < dim("hi"))
        .count()
      assert(n > 0)
      // equi joins of two large sides are untouched
      val m = fact.join(graft.queries.Tables(spark, sf, "orders"),
        fact("l_orderkey") === col("o_orderkey")).count()
      assert(m > 0)
      // and the whole declared gate stays green with the flag on:
      // a representative sample across families plans + runs
      for (q <- Seq("q5_nation_revenue", "ev_value_bands", "q_semi_anti",
          "e_ann_topk", "d_dedup_exact")) {
        assert(SparkEntry.queries(q)(spark, sf).count() > 0, q)
      }
    }
  }
}
