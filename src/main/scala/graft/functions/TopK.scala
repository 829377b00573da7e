package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded exact top-k per group as a typed `Aggregator[IN, BUF, OUT]`
  * (SURVEY §7's sanctioned custom-aggregate seam) — the scale path for
  * "k best per key": the buffer never holds more than k elements, so
  * the partial/final split ships k rows per group per map task instead
  * of every candidate through a full window sort. Compare
  * `row_number().over(Window...)` which shuffles and sorts ALL
  * candidates per key first.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * window form, so the two plans are result-equal (spec-checked).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)],
      Seq[(Long, Double)]] {

  private def best(l: List[(Long, Double)]): List[(Long, Double)] =
    l.sortBy { case (id, score) => (-score, id) }.take(k)

  override def zero: List[(Long, Double)] = Nil
  override def reduce(b: List[(Long, Double)],
      a: (Long, Double)): List[(Long, Double)] =
    if (b.lengthCompare(k) < 0) best(a :: b)
    else {
      // buffer is full and sorted: reject anything not beating the tail
      val (tid, tscore) = b.last
      if (a._2 > tscore || (a._2 == tscore && a._1 < tid)) best(a :: b)
      else b
    }
  override def merge(b1: List[(Long, Double)],
      b2: List[(Long, Double)]): List[(Long, Double)] = best(b1 ::: b2)
  override def finish(r: List[(Long, Double)]): Seq[(Long, Double)] = best(r)
  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder()
}

object TopK {
  /** `(key, id, score)` rows → `(key, id, score, rank)` of the k best
    * per key, via the bounded aggregator. Column names are taken from
    * the input's three columns and preserved on output.
    */
  def perKey(df: DataFrame, k: Int): DataFrame = {
    val Seq(keyCol, idCol, scoreCol) = df.columns.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k).toColumn.name("topk")
    df.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg)
      .toDF(keyCol, "topk")
      .select(col(keyCol), posexplode(col("topk")))
      .select(col(keyCol), col("col._1").as(idCol),
        col("col._2").as(scoreCol),
        (col("pos") + 1).cast("bigint").as("rank"))
  }

  /** Column form for typed callers. */
  def topKColumn(k: Int): Column =
    new TopKAggregator(k).toColumn.name("topk")
}
