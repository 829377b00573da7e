package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.range_bucket

/** Multi-dimensional Z-order (Morton-curve) clustering for data
  * skipping — the lakehouse `OPTIMIZE ZORDER BY` capability: rewrite a
  * table so that rows close in SEVERAL columns land in the same files,
  * making parquet row-group min/max stats tight in every clustered
  * dimension at once. A layout sorted by one column skips scans only on
  * that column; a Z-ordered layout skips on any clustered dimension —
  * at 100 TB this is the difference between reading ~box-fraction of
  * the table and reading all of it for every predicate that isn't on
  * the sort key.
  *
  * Mechanics (the standard range-id scheme):
  *
  *  1. one driver-side stats pass computes approximate quantile cut
  *     points per clustering column (`approxQuantile` — a single
  *     aggregation job, never a sort), so bucket ids are RANK-based and
  *     skew-proof: each of the 2^bits buckets holds ~equal row counts
  *     even when values cluster;
  *  2. each row's per-column bucket ids (codegen'd binary search,
  *     [[graft.expressions.RangeBucket]]) are bit-interleaved into one
  *     z-key — composed entirely from built-in shift/and/or column ops,
  *     so the whole key stays inside WholeStageCodegen;
  *  3. `repartitionByRange` on the z-key packs contiguous curve
  *     segments into files and `sortWithinPartitions` orders rows
  *     inside each file, so row-group boundaries cut the curve into
  *     tight multi-dimensional boxes.
  *
  * Everything distributed is one range shuffle — cost identical to the
  * single-column sort rewrite the naive layout needs anyway.
  */
object ZOrder {

  /** Bit-interleave per-column bucket ids into the Morton key:
    * bit `b` of bucket `i` lands at position `b * n + i`. Pure built-in
    * bit ops (shiftright/bitwiseAND/shiftleft/bitwiseOR) — `bits × n`
    * codegen'd terms, no UDF, no custom expression.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 1, "at least one bucket column")
    require(n * bits <= 63, s"n*bits must fit a signed long, got ${n * bits}")
    val terms = for { b <- 0 until bits; i <- 0 until n } yield
      shiftleft(shiftright(buckets(i).cast("long"), b).bitwiseAND(lit(1L)),
        b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Order-preserving numeric key for a STRING dimension: the first 7
    * BYTES of the value's UTF-8 form (NUL-padded, so "b" > "ab" holds
    * after padding), read as an unsigned 56-bit big-endian integer.
    * Byte-lexicographic order on equal-length byte prefixes IS UTF-8
    * order — the same order the manifest's truncated string bounds and
    * Spark's own string comparisons use — so rank-bucketing this key
    * rank-buckets the strings. 7 bytes (not 8) keeps the value inside
    * a signed long — but the EFFECTIVE prefix is ~6.6 bytes (53 bits):
    * [[zdimRaw]] immediately casts the key to double for the quantile
    * sketch ([[RangeBucket]] and `approxQuantile` are double-typed),
    * and a double's mantissa holds 53 bits, so keys differing only in
    * the low ~3 bits of the 7th byte round to the same double. The
    * rounding is MONOTONE (long→double never inverts order), so the
    * collapse only merges adjacent keys into one bucket — exactly the
    * tie-widening the next sentence describes, never a mis-order.
    * Ties beyond the prefix collapse into one bucket,
    * which only widens a tile, never mis-orders it (the reference's
    * natural string keys — 64-char block hashes, addresses — separate
    * in their first bytes). Entirely built-in functions: rpad →
    * encode → substring → hex → conv, all inside WholeStageCodegen.
    */
  private[graft] def stringZKey(c: Column): Column =
    conv(hex(substring(encode(
      rpad(coalesce(c, lit("")), 7, "\u0000"), "UTF-8"), 1, 7)),
      16, 10).cast("long")

  /** One dimension's RAW numeric key, nulls preserved: the quantile
    * stats pass must see nulls as nulls (the sketch ignores them) — a
    * null-heavy column coalesced BEFORE the stats pass would collapse
    * a proportional share of its cut points onto the sentinel and
    * halve the curve resolution for the real values.
    */
  private def zdimRaw(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType =>
        // stringZKey coalesces null -> "" internally; route nulls
        // around it so they stay null for the sketch
        when(col(c).isNull, lit(null).cast("double"))
          .otherwise(stringZKey(col(c)).cast("double"))
      case _ => col(c).cast("double")
    }

  /** The same dimension as the bucket INPUT: nulls to the lowest
    * curve corner so they cluster rather than scatter.
    */
  private def zdim(df: DataFrame, c: String): Column =
    coalesce(zdimRaw(df, c), lit(Double.MinValue))

  /** The z-key column for `cols` of `df`: quantile cut points from one
    * driver stats pass, rank-buckets via codegen'd binary search,
    * interleaved. Numeric/date/timestamp columns rank directly;
    * STRING columns rank via their order-preserving 7-byte UTF-8
    * prefix key ([[stringZKey]]) — the reference's natural keys
    * (block hashes, addresses) are strings, so the curve must handle
    * them first-class. Nulls bucket to 0 (lowest curve corner) so
    * they cluster together rather than scattering.
    */
  def zkey(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty, "at least one clustering column")
    val probes = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // one pass over all columns; error a quarter of the bucket width —
    // a misplace of a few rows per boundary shifts curve tiles, never
    // correctness (the stats sketch cost scales with 1/eps, so tying
    // eps to the bucket width keeps the pass cheap at low `bits`)
    val eps = 0.25 / (1 << bits)
    val dims = cols.map(c => zdim(df, c))
    val tmp = cols.indices.map(i => s"__zq_$i")
    // quantiles are computed over the RAW derived keys (strings have
    // no numeric quantiles; nulls stay null so the sketch ignores
    // them) in one stats pass — only the bucket input coalesces
    val raws = cols.map(c => zdimRaw(df, c))
    val bounds = df.select(raws.zip(tmp).map { case (e, n) => e.as(n) }: _*)
      .stat.approxQuantile(tmp.toArray, probes, eps)
    val buckets = dims.zip(bounds).map { case (e, bs) =>
      val ds = bs.distinct.sorted
      // an all-null/NaN dimension has NO cut points (the sketch saw
      // nothing): it contributes one constant bucket — the whole
      // column sits at the curve corner, same as the nulls themselves
      if (ds.isEmpty) lit(0)
      else {
      val raw = range_bucket(e, ds)
      // spread each dimension's rank into the FULL bit-space: a column
      // with few distinct values (so few distinct cut points) would
      // otherwise leave its top bits always zero and the other
      // dimensions' top bits would dominate the curve — degrading the
      // layout to a plain sort on the wide column
      (raw.cast("long") * (1L << bits) / (ds.length + 1)).cast("int")
      }
    }
    interleave(buckets, bits)
  }

  /** Rewrite `df` into `numFiles` z-ordered files at `path`: range
    * partition on the z-key (contiguous curve segments per file), sort
    * within each file (tight row-group boxes), staged-atomic overwrite
    * via the same machinery as every other sink here.
    */
  def cluster(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 8): Unit = {
    val keyed = df.withColumn("__z", zkey(df, cols, bits))
    val laid = keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    ParquetIO.overwriteSafe(laid, path)
  }
}
