package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY §2 extension surface). Preference
  * order per the build rules: these exist because the hot paths —
  * per-row 64-bit hashing, simhash, float-vector cosine, LSH bucketing —
  * would otherwise be Scala UDFs (opaque to codegen, boxing on every
  * row) or higher-order-function chains (`zip_with`+`aggregate`, which
  * evaluate interpreted per element). Each expression code-generates a
  * single static call into [[Kernels]], keeping the enclosing
  * WholeStageCodegen span intact.
  */
private object K { val name: String = Kernels.getClass.getName.stripSuffix("$") }

/** 64-bit FNV-1a of a string — document fingerprinting / exact-dup keys. */
case class Fnv1a64(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "fnv1a64"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.fnv1a64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.fnv1a64($c)")
  override protected def withNewChildInternal(c: Expression): Fnv1a64 = copy(c)
}

/** Unicode NFC normalization — the canonicalization every text-dedup
  * pipeline needs BEFORE fingerprinting: "café" composed (U+00E9) and
  * decomposed (e + U+0301) are byte-different, so every hash/shingle
  * operator sees two documents until normalization folds them. Spark
  * has no built-in; this keeps it inside whole-stage codegen (one
  * static call, input returned untouched on the NFC-quick-check fast
  * path).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(c)
}

/** 64-bit SimHash of whitespace tokens (spec in Kernels.simhash64). */
case class SimHash64(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Popcount of a bitmap BINARY column — the read side of the exact
  * mergeable bitmap-distinct family (`graft.functions.BitmapDistinct`):
  * persisted bitmaps union by byte-OR, and cardinality is one codegen'd
  * pass over the final bytes.
  */
case class BitmapCardinality(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(BinaryType)
  override def prettyName: String = "bitmap_cardinality"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.bitmapCardinality(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.bitmapCardinality($c)")
  override protected def withNewChildInternal(c: Expression): BitmapCardinality =
    copy(c)
}

/** |A ∩ B| of two bitmap BINARY columns — popcount of the byte-AND,
  * the exact audience-overlap primitive (`q_bitmap_intersect`).
  */
case class BitmapAndCardinality(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def prettyName: String = "bitmap_and_cardinality"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.bitmapAndCardinality(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${K.name}.bitmapAndCardinality($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BitmapAndCardinality = copy(l, r)
}

/** popcount(a XOR b) — bit distance between two 64-bit signatures. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes = Seq(LongType, LongType)
  override def prettyName: String = "hamming64"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${K.name}.hamming64($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : HammingDistance = copy(l, r)
}

/** Cosine similarity over two array<float> embedding columns,
  * double-accumulated.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${K.name}.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CosineSim = copy(l, r)
}

/** Dot product over two array<float> columns. */
case class DotF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def prettyName: String = "dot_f"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${K.name}.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotF = copy(l, r)
}

/** Distinct word n-grams of a string (spec in Kernels.wordNGrams) —
  * the shingle builder for the similarity joins, single-pass and
  * codegen'd where the built-in `transform`/`slice`/`array_join`
  * composition is interpreted and O(len²) per row.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression
    with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "word_ngrams"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.wordNGrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.wordNGrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordNGrams =
    copy(child = c)
}

/** Winnowing fingerprints of a document (spec in
  * Kernels.winnowFingerprints): rolling-hash char k-grams, window-min
  * selection — the MOSS document-fingerprinting scheme as one codegen'd
  * pass per row.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "k must be >= 1")
  require(w >= 1, "w must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "winnow_fingerprints"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.winnowFingerprints(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.winnowFingerprints($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** Distinct char k-gram hashes of a document (spec in
  * Kernels.charGramHashes) — the exact set the winnowed selection
  * samples from, for exact-containment rescoring.
  */
case class CharGramHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "char_gram_hashes"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.charGramHashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.charGramHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): CharGramHashes =
    copy(child = c)
}

/** MinHash signature vector of a shingle array (spec in
  * Kernels.minHashSigs) — the candidate-generation half of the
  * MinHash/LSH dedup family, one codegen'd pass per row.
  */
case class MinHashSigs(child: Expression, numTables: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(numTables > 0, "numTables must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(StringType))
  override def prettyName: String = "minhash_sigs"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.minHashSigs(v.asInstanceOf[ArrayData], numTables, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.minHashSigs($c, $numTables, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

/** Int8 scalar quantization of an embedding — array<float> → binary
  * codes, 4× smaller (spec in Kernels.sq8Quantize).
  */
case class Sq8Quantize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = BinaryType
  override def inputTypes = Seq(ArrayType(FloatType))
  override def prettyName: String = "sq8_quantize"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.sq8Quantize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.sq8Quantize($c)")
  override protected def withNewChildInternal(c: Expression): Sq8Quantize =
    copy(c)
}

/** Cosine over two int8 code vectors — integer dot/norms, scales cancel. */
case class Sq8Cosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def prettyName: String = "sq8_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.sq8Cosine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${K.name}.sq8Cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Sq8Cosine = copy(l, r)
}

/** PQ-encode an embedding against driver-trained codebooks (spec in
  * Kernels.pqEncode): array<float> → m-byte code. The codebook array
  * rides as a codegen reference object (same pattern as
  * [[RangeBucket]]'s cut points) — kilobytes shipped once per task,
  * zero per-row allocation beyond the code bytes.
  */
case class PqEncode(child: Expression, codebooks: Array[Float], m: Int,
    k: Int) extends UnaryExpression with ExpectsInputTypes {
  require(m > 0 && k > 0 && k <= 256, "need m > 0 and 0 < k <= 256")
  require(codebooks.length % (m * k) == 0,
    "codebook length must be m*k*subDim")
  override def dataType: DataType = BinaryType
  override def inputTypes = Seq(ArrayType(FloatType))
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.pqEncode(v.asInstanceOf[ArrayData], codebooks, m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, c => s"${K.name}.pqEncode($c, $ref, $m, $k)")
  }
  // value equality over the codebook array (see RangeBucket)
  override def equals(o: Any): Boolean = o match {
    case PqEncode(c, b, om, ok) => c == child && om == m && ok == k &&
      java.util.Arrays.equals(b, codebooks)
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * child.hashCode() + java.util.Arrays.hashCode(codebooks)) * 31
      + m) * 31 + k
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Nearest-centroid cell id (spec in Kernels.ivfCell): array<float> →
  * int in [0, k). The IVF coarse quantizer's ASSIGNMENT step as a pure
  * codegen'd projection — the fitted centroids ride as a codegen
  * reference object, so assigning a 100 TB corpus is a single
  * shuffle-free scan (no window argmin, no centroid join).
  */
case class IvfCell(child: Expression, centroids: Array[Float], k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && k <= 256, "need 0 < k <= 256")
  require(centroids.length % k == 0, "centroid length must be k*dim")
  override def dataType: DataType = IntegerType
  override def inputTypes = Seq(ArrayType(FloatType))
  override def prettyName: String = "ivf_cell"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.ivfCell(v.asInstanceOf[ArrayData], centroids, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[]")
    defineCodeGen(ctx, ev, c => s"${K.name}.ivfCell($c, $ref, $k)")
  }
  // value equality over the centroid array (see RangeBucket)
  override def equals(o: Any): Boolean = o match {
    case IvfCell(c, b, ok) => c == child && ok == k &&
      java.util.Arrays.equals(b, centroids)
    case _ => false
  }
  override def hashCode(): Int =
    (31 * child.hashCode() + java.util.Arrays.hashCode(centroids)) * 31 + k
  override protected def withNewChildInternal(c: Expression): IvfCell =
    copy(child = c)
}

/** Query-side ADC distance table (spec in Kernels.pqAdcTable):
  * array<float> → m·k squared-subdistance floats, computed once per
  * query row; [[PqAdc]] then scores any corpus code in m lookups.
  */
case class PqAdcTable(child: Expression, codebooks: Array[Float], m: Int,
    k: Int) extends UnaryExpression with ExpectsInputTypes {
  require(m > 0 && k > 0 && k <= 256, "need m > 0 and 0 < k <= 256")
  require(codebooks.length % (m * k) == 0,
    "codebook length must be m*k*subDim")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def inputTypes = Seq(ArrayType(FloatType))
  override def prettyName: String = "pq_adc_table"
  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Kernels.pqAdcTable(v.asInstanceOf[ArrayData], codebooks, m, k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[]")
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .getName
    defineCodeGen(ctx, ev,
      c => s"new $gad(${K.name}.pqAdcTable($c, $ref, $m, $k))")
  }
  override def equals(o: Any): Boolean = o match {
    case PqAdcTable(c, b, om, ok) => c == child && om == m && ok == k &&
      java.util.Arrays.equals(b, codebooks)
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * child.hashCode() + java.util.Arrays.hashCode(codebooks)) * 31
      + m) * 31 + k
  override protected def withNewChildInternal(c: Expression): PqAdcTable =
    copy(child = c)
}

/** ADC score of one corpus code against one query table (spec in
  * Kernels.pqAdc): approximate squared L2 in normalized space, m table
  * lookups per pair — the inner loop of the PQ coarse scan.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(ArrayType(FloatType), BinaryType)
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(t: Any, c: Any): Any =
    Kernels.pqAdc(t.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"${K.name}.pqAdc($t, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : PqAdc = copy(l, r)
}

/** Rank bucket against driver-computed quantile cut points (spec in
  * Kernels.rangeBucket) — codegen'd binary search, the per-row half of
  * Z-order clustering. The bounds array rides along as a referenced
  * object in generated code, so the expression stays inside
  * WholeStageCodegen with zero per-row allocation.
  */
case class RangeBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(bounds.nonEmpty, "bounds must be non-empty")
  override def dataType: DataType = IntegerType
  override def inputTypes = Seq(DoubleType)
  override def prettyName: String = "range_bucket"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.rangeBucket(v.asInstanceOf[Double], bounds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "double[]")
    defineCodeGen(ctx, ev, c => s"${K.name}.rangeBucket($c, $ref)")
  }
  // Array fields compare by identity; compare cut points by value so
  // equal bucketings canonicalize together (subexpression elimination)
  override def equals(o: Any): Boolean = o match {
    case RangeBucket(c, b) => c == child && java.util.Arrays.equals(b, bounds)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bounds)
  override protected def withNewChildInternal(c: Expression): RangeBucket =
    copy(child = c)
}

/** Deterministic signed-random-projection LSH bucket of an embedding. */
case class SrpBucket(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(numBits > 0 && numBits < 64, "numBits must be in [1, 63]")
  override def dataType: DataType = LongType
  override def inputTypes = Seq(ArrayType(FloatType))
  override def prettyName: String = "srp_bucket"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.srpBucket(v.asInstanceOf[ArrayData], numBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${K.name}.srpBucket($c, $numBits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SrpBucket =
    copy(child = c)
}

/** Multi-probe SRP bucket list (query-side of [[SrpBucket]]'s LSH):
  * the base bucket plus the nProbes-1 most-likely neighbouring buckets
  * by flipping low-|margin| bits (Kernels.srpProbes). Element 0 is
  * always the base bucket, so `explode(srp_probes(v, b, s, 1))` ≡
  * `srp_bucket(v, b, s)`.
  */
case class SrpProbes(child: Expression, numBits: Int, seed: Long,
    nProbes: Int) extends UnaryExpression with ExpectsInputTypes {
  require(numBits > 0 && numBits < 64, "numBits must be in [1, 63]")
  require(nProbes > 0, "nProbes must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(FloatType))
  override def prettyName: String = "srp_probes"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.srpProbes(v.asInstanceOf[ArrayData], numBits, seed, nProbes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${K.name}.srpProbes($c, $numBits, ${seed}L, $nProbes)")
  override protected def withNewChildInternal(c: Expression): SrpProbes =
    copy(child = c)
}
