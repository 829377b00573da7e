package graft

import graft.functions.{TopK, TopKAggregator}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator laws: reduce/merge keep the k best with stable ties") {
    val agg = new TopKAggregator(3)
    val items = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
    val all = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(all) == Seq((2L, 0.9), (3L, 0.9), (5L, 0.7)))
    // merge of disjoint partial buffers == reduce over the concatenation
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == agg.finish(all))
    // full-buffer rejection path: a worse element changes nothing
    assert(agg.reduce(all, (9L, 0.05)) == all)
  }

  test("perKey equals the window row_number form on sf0.001 ANN") {
    val viaAgg = SparkEntry.queries("e_ann_topk_agg")(
      spark, "/root/testdata/sf0.001").collect()
    val viaWindow = SparkEntry.queries("e_ann_topk")(
      spark, "/root/testdata/sf0.001").collect()
    assert(viaAgg.length == viaWindow.length && viaAgg.nonEmpty)
    assert(viaAgg.sameElements(viaWindow))
  }

  test("perKey plans a partial aggregate, not a window sort") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 12L, 0.2))
      .toDF("k", "id", "s")
    val p = TopK.perKey(df, 2).queryExecution.executedPlan.toString()
    assert(!p.contains("Window"), s"expected no Window node:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected an aggregate node:\n$p")
  }
}
