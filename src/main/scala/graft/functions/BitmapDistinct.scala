package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** EXACT mergeable distinct-count state for non-negative integer keys —
  * the exact companion to the approximate HLL sketch family
  * (`q_hll_merge`): a bitmap of the key domain. Same algebra as a
  * sketch (daily partials persist once, any range merges by byte-OR,
  * cardinality is one popcount pass — history never rescanned) but the
  * answer is EXACT, so the whole family sits under the full DuckDB
  * oracle instead of a tolerance bound.
  *
  * State size is domain-bound, not sample-bound: ⌈(maxId+1)/8⌉ bytes
  * (a 1-billion-key domain = 125 MB per group — use HLL there; for
  * bounded entity domains like users/skus/devices the bitmap is small
  * AND exact, which is why warehouses keep both). The build aggregate
  * is a classic partial/final: each map task ORs its rows into one
  * buffer, only buffers cross the shuffle.
  */
object BitmapDistinct {

  private[graft] def setBit(buf: Array[Byte], id: Long): Array[Byte] = {
    require(id >= 0 && id < (1L << 33),
      s"bitmap key out of supported domain [0, 2^33): $id")
    val idx = (id >> 3).toInt
    val out =
      if (idx < buf.length) buf
      else java.util.Arrays.copyOf(buf,
        math.max(idx + 1, math.max(buf.length * 2, 16)))
    out(idx) = (out(idx) | (1 << (id & 7L).toInt)).toByte
    out
  }

  private[graft] def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    val out = java.util.Arrays.copyOf(big, big.length)
    var i = 0
    while (i < small.length) {
      out(i) = (out(i) | small(i)).toByte
      i += 1
    }
    out
  }

  /** Fold non-negative long keys into one bitmap (BINARY). */
  class BuildAggregator extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], id: Long): Array[Byte] = setBit(b, id)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = or(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union already-built bitmap columns (the range-merge read path). */
  class UnionAggregator
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], v: Array[Byte]): Array[Byte] =
      or(b, v)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = or(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `bitmap_build(keyCol)` aggregate Column. */
  def build(col: Column): Column = udaf(new BuildAggregator).apply(col)

  /** `bitmap_union(bitmapCol)` aggregate Column. */
  def union(col: Column): Column = udaf(new UnionAggregator).apply(col)

  /** Exact cardinality of a bitmap column (codegen'd popcount). */
  def cardinality(col: Column): Column =
    GraftFunctions.bitmap_cardinality(col)
}
