package graft.sources

import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the Dune-result seam (`spark.read
  * .format("dune")`): the production-shaped version of [[FixtureSource]].
  * The reference's extractor executes a saved query and polls for a JSON
  * rows payload (`dune_extractor.py:44-107`), with the incremental
  * watermark shipped as a server-side `date` parameter
  * (`dune_extractor.py:57-59`). This connector models that protocol as a
  * first-class Spark source:
  *
  *  - **filter pushdown** ([[SupportsPushDownFilters]]) = the watermark
  *    parameter: comparison predicates are accepted into the scan and
  *    applied while parsing, before anything enters the plan — exactly
  *    where the REST parameter would cut the payload. Catalyst drops its
  *    own copy of accepted filters (visible as `PushedFilters` in
  *    explain).
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): only
  *    requested fields are materialized from the JSON.
  *  - **partition planning**: the payload is split into byte ranges,
  *    one [[InputPartition]] each (standard first-newline-after-offset
  *    protocol), so a large result parses in parallel across executors.
  *    In a live implementation partitions would map to result pages.
  *
  * Zero-egress build: the "payload" is the fixture file
  * `<path>/<queryId>.json` (JSON lines — the shape of Dune's
  * `result.rows`). Swapping the opened stream for an HTTP body is the
  * only change a live source needs; everything Catalyst sees stays
  * identical.
  *
  * Usage:
  * {{{
  * spark.read.format("dune")
  *   .option("path", fixtureDir).option("queryId", "5816212")
  *   .load()
  *   .filter($"date" > "2025-01-01")   // pushed into the scan
  * }}}
  */
class DuneDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dune"

  private def fixturePath(options: CaseInsensitiveStringMap): String = {
    val dir = Option(options.get("path")).getOrElse(
      sys.error("dune source requires .option(\"path\", fixtureDir)"))
    val qid = Option(options.get("queryId")).getOrElse(
      sys.error("dune source requires .option(\"queryId\", id)"))
    s"$dir/$qid.json"
  }

  /** Schema comes from a driver-side inference pass over the payload
    * (pandas-equivalent of the reference's dtype inference,
    * `pg_loader.py:49-68`); declare via `.schema(...)` to skip it —
    * Spark then never calls this (supportsExternalMetadata). The
    * counter makes "no inference pass happened" spec-observable.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    DuneDataSource.inferenceRuns.incrementAndGet()
    SparkSession.active.read.json(fixturePath(options)).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new DuneTable(schema,
      fixturePath(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

object DuneDataSource {
  /** Count of driver-side schema-inference passes (each one is an
    * O(payload) read). Incremental pipeline runs that declare their
    * schema must not add to this — asserted in DuneDataSourceSpec.
    */
  val inferenceRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The value types the reader's `cmp` compares EXACTLY — the shared
    * acceptance contract for pushed AND runtime filters.
    */
  private[sources] def exactlyComparable(v: Any): Boolean = v match {
    case _: String | _: java.lang.Long | _: java.lang.Integer |
         _: java.lang.Double | _: java.lang.Boolean => true
    case _ => false
  }
}

private class DuneTable(tableSchema: StructType, path: String) extends Table
    with SupportsRead {
  override def name(): String = s"dune:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DuneScanBuilder(tableSchema, path)
}

private class DuneScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[(Array[AggregateFunc], StructType)] = None
  private var limit: Int = -1

  /** PARTIAL limit pushdown: each split stops parsing after `n`
    * accepted rows (Spark re-applies the global limit above), so a
    * preview query over a huge payload reads a prefix, not the file.
    */
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  /** Accept the comparison shapes the Dune parameter protocol can
    * express (the watermark is `col > value` — `__main__.py:114-123`);
    * everything else stays in the plan above the scan.
    *
    * Value types are restricted to the ones the reader's `cmp` compares
    * EXACTLY (String/Long/Integer/Double/Boolean). Catalyst never
    * re-checks an accepted filter, and the declared-schema path
    * (supportsExternalMetadata) can legally produce Timestamp/Date/
    * Decimal filter values — comparing those as strings against raw
    * JSON text (e.g. `2025-01-01 00:00:00.0` vs `2025-01-01T00:00:00`)
    * would silently return wrong rows, so such filters are rejected and
    * evaluated by Catalyst above the scan instead.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    import DuneDataSource.exactlyComparable
    val (accepted, rejected) = filters.partition {
      case _: IsNotNull => true
      case EqualTo(_, v) => exactlyComparable(v)
      case GreaterThan(_, v) => exactlyComparable(v)
      case GreaterThanOrEqual(_, v) => exactlyComparable(v)
      case LessThan(_, v) => exactlyComparable(v)
      case LessThanOrEqual(_, v) => exactlyComparable(v)
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // once an aggregation is pushed the scan's output IS the aggregate
    // schema; the pruning call that follows refers to that same shape
    if (pushedAgg.isEmpty) required = requiredSchema

  // ---- aggregate pushdown (the reference's A1 MAX-watermark and A2
  // COUNT probes computed AT the source — server-side in the real Dune
  // protocol, one in-scan pass over the payload here) ----

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[StructField] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      fullSchema.fields.find(_.name == nr.fieldNames.head)
    case _ => None
  }

  private def minMaxable(f: StructField): Boolean = f.dataType match {
    case LongType | IntegerType | DoubleType | StringType => true
    case _ => false
  }

  /** Ungrouped COUNT(*) / COUNT(col) / MIN / MAX over the primitive
    * columns the JSON parser handles exactly; anything else (group-bys,
    * distinct counts, sums — double summation order would differ from
    * Catalyst's) is left to Spark above the scan.
    */
  private def planAgg(agg: Aggregation)
      : Option[(Array[AggregateFunc], StructType)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val fields = agg.aggregateExpressions.map {
      case _: CountStar =>
        Some(StructField("count(*)", LongType, nullable = false))
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).map(f =>
          StructField(s"count(${f.name})", LongType, nullable = false))
      case m: Max => fieldOf(m.column).filter(minMaxable)
        .map(f => StructField(s"max(${f.name})", f.dataType))
      case m: Min => fieldOf(m.column).filter(minMaxable)
        .map(f => StructField(s"min(${f.name})", f.dataType))
      case _ => None
    }
    if (fields.exists(_.isEmpty)) None
    else Some((agg.aggregateExpressions, StructType(fields.map(_.get).toSeq)))
  }

  // PARTIAL pushdown only (supportCompletePushDown stays false): each
  // byte-range split folds its rows to one partial row and Spark's
  // final aggregate merges them — the probe keeps the connector's
  // split parallelism instead of serializing a multi-GB payload onto
  // one task, and the final agg touches #splits rows, not the payload.
  override def pushAggregation(agg: Aggregation): Boolean =
    planAgg(agg) match {
      case Some(p) => pushedAgg = Some(p); true
      case None => false
    }

  override def build(): Scan = pushedAgg match {
    case Some((funcs, aggSchema)) =>
      new DuneAggScan(fullSchema, aggSchema, funcs, pushed, path)
    case None => new DuneScan(required, pushed, path, limit)
  }
}

/** Partially-pushed ungrouped aggregation: the SAME byte-range splits
  * as the row scan, each folding its filtered rows to ONE partial row
  * (null-skipping min/max, per-split counts); Spark's final aggregate
  * merges #splits rows. Parallelism is preserved and no fact rows
  * materialize into Spark.
  */
private class DuneAggScan(fullSchema: StructType, aggSchema: StructType,
    funcs: Array[AggregateFunc], filters: Array[Filter], path: String)
    extends Scan with Batch with SupportsReportStatistics {
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sparkContext.hadoopConfiguration)
  private lazy val splits = DuneSplits.byteRanges(path, hadoopConf.value)

  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"DuneAggScan path=$path, PushedAggregates=[${funcs.mkString(", ")}], " +
      s"PushedFilters=[${filters.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    splits.map(_.asInstanceOf[InputPartition])

  /** Exactly known: one partial row per split. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(splits.length.toLong * 128L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(splits.length.toLong)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DuneAggReaderFactory(fullSchema, funcs, filters, hadoopConf)
}

private class DuneAggReaderFactory(fullSchema: StructType,
    funcs: Array[AggregateFunc], filters: Array[Filter],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DuneAggReader(fullSchema, funcs, filters,
      p.asInstanceOf[DunePartition], hadoopConf)
}

/** Folds the filtered rows of its split into one aggregate row. Reuses
  * [[DuneReader]] for line framing, filter evaluation, and typed
  * projection: the input schema is the distinct set of referenced
  * columns, each aggregate folds over its column's slot.
  */
private class DuneAggReader(fullSchema: StructType,
    funcs: Array[AggregateFunc], filters: Array[Filter],
    part: DunePartition,
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private def refName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames.head)
    case _ => None
  }

  private val inputCols: Seq[String] = funcs.toSeq.flatMap {
    case c: Count => refName(c.column)
    case m: Max => refName(m.column)
    case m: Min => refName(m.column)
    case _ => None
  }.distinct
  private val inputSchema = StructType(
    inputCols.map(n => fullSchema.fields.find(_.name == n).get))
  // hot-loop state, resolved ONCE: slot index and column type per func
  // (-1 = CountStar, no column)
  private val slots: Array[Int] = funcs.map {
    case c: Count => inputCols.indexOf(refName(c.column).get)
    case m: Max => inputCols.indexOf(refName(m.column).get)
    case m: Min => inputCols.indexOf(refName(m.column).get)
    case _ => -1
  }
  private val slotTypes: Array[DataType] =
    slots.map(i => if (i < 0) NullType else inputSchema.fields(i).dataType)

  private var done = false
  private var result: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    val rows = new DuneReader(inputSchema, filters, part, hadoopConf)
    val counts = new Array[Long](funcs.length)
    val extremes = new Array[Any](funcs.length)
    try {
      while (rows.next()) {
        val row = rows.get()
        var i = 0
        while (i < funcs.length) {
          funcs(i) match {
            case _: CountStar => counts(i) += 1
            case _: Count => if (!row.isNullAt(slots(i))) counts(i) += 1
            case _: Max => fold(row, i, extremes, keepGreater = true)
            case _: Min => fold(row, i, extremes, keepGreater = false)
            case _ => ()
          }
          i += 1
        }
      }
    } finally rows.close()
    result = InternalRow.fromSeq(funcs.toSeq.zipWithIndex.map {
      case (_: CountStar, i) => counts(i)
      case (_: Count, i) => counts(i)
      case (_, i) => extremes(i)
    })
    done = true
    true
  }

  /** Null-skipping typed min/max fold; `extremes(i)` holds the running
    * value in the column's Catalyst representation.
    */
  private def fold(row: InternalRow, i: Int,
      extremes: Array[Any], keepGreater: Boolean): Unit = {
    val col = slots(i)
    if (row.isNullAt(col)) return
    val v: Any = slotTypes(i) match {
      case LongType => row.getLong(col)
      case IntegerType => row.getInt(col)
      case DoubleType => row.getDouble(col)
      case StringType => row.getUTF8String(col).copy()
      case other => sys.error(s"unsupported min/max type $other")
    }
    val cur = extremes(i)
    if (cur == null) { extremes(i) = v; return }
    val c = slotTypes(i) match {
      case LongType => java.lang.Long.compare(
        v.asInstanceOf[Long], cur.asInstanceOf[Long])
      case IntegerType => java.lang.Integer.compare(
        v.asInstanceOf[Int], cur.asInstanceOf[Int])
      case DoubleType => java.lang.Double.compare(
        v.asInstanceOf[Double], cur.asInstanceOf[Double])
      case StringType => v.asInstanceOf[UTF8String]
        .compareTo(cur.asInstanceOf[UTF8String])
      case other => sys.error(s"unsupported min/max type $other")
    }
    if ((keepGreater && c > 0) || (!keepGreater && c < 0)) extremes(i) = v
  }

  override def get(): InternalRow = result
  override def close(): Unit = ()
}

private class DuneScan(schema: StructType, filters: Array[Filter],
    path: String, limit: Int = -1)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (DPP-style) filters: Spark collects the build side of a
    * join at execution time and hands the key set down as `In` filters
    * — the v2 twin of `q_dpp`'s PartitionFilters subquery. The reader
    * applies them while PARSING, so non-matching payload rows are
    * dropped before a Spark row is ever built. Dropping a runtime
    * filter is always safe (the join above re-checks); accepting one
    * means exact evaluation, so only `cmp`-exact value types pass —
    * the same contract as pushFilters.
    */
  @volatile private var runtime: Array[Filter] = Array.empty
  override def filterAttributes(): Array[NamedReference] =
    schema.fieldNames.map(f => Expressions.column(f))
  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter {
      case In(_, vs) => vs.forall(DuneDataSource.exactlyComparable)
      case _ => false
    }

  /** Payload byte size as the size estimate (row count unknown without
    * a scan) — enough for the planner's broadcast/shuffle decisions
    * over the connector.
    */
  private lazy val payloadBytes: Long = {
    val p = new Path(path)
    p.getFileSystem(hadoopConf.value).getFileStatus(p).getLen
  }
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(payloadBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
  // Captured on the driver so executors open the file through the
  // SESSION's Hadoop configuration (S3A credentials, nameservices…) —
  // a bare `new Configuration()` on the executor would drop all of it.
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sparkContext.hadoopConfiguration)

  override def readSchema(): StructType = schema
  override def description(): String =
    s"DuneScan path=$path, PushedFilters=[${filters.mkString(", ")}], " +
      (if (limit >= 0) s"PushedLimit=$limit, " else "") +
      s"ReadSchema=${schema.simpleString}"
  override def toBatch: Batch = this

  /** Byte-range splits; each reader starts at the first line boundary
    * past its offset, so no line is read twice or skipped.
    */
  override def planInputPartitions(): Array[InputPartition] =
    DuneSplits.byteRanges(path, hadoopConf.value)
      .map(_.asInstanceOf[InputPartition])

  override def createReaderFactory(): PartitionReaderFactory =
    new DuneReaderFactory(schema, filters ++ runtime, hadoopConf, limit)
}

private object DuneSplits {
  /** ≥4 MiB byte-range splits capped at the session's parallelism —
    * the one split planner both scan shapes share.
    */
  def byteRanges(path: String,
      conf: org.apache.hadoop.conf.Configuration): Array[DunePartition] = {
    val p = new Path(path)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    val targetSplits = math.max(1,
      math.min(SparkSession.active.sparkContext.defaultParallelism,
        (len / (4L << 20)).toInt + 1))
    val step = math.max(1L, len / targetSplits)
    (0L until len by step).map(start =>
      DunePartition(path, start, math.min(start + step, len))).toArray
  }
}

private case class DunePartition(path: String, start: Long, end: Long)
    extends InputPartition

private class DuneReaderFactory(schema: StructType, filters: Array[Filter],
    hadoopConf: org.apache.spark.util.SerializableConfiguration,
    limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DuneReader(schema, filters, p.asInstanceOf[DunePartition],
      hadoopConf, limit)
}

private class DuneReader(schema: StructType, filters: Array[Filter],
    part: DunePartition,
    hadoopConf: org.apache.spark.util.SerializableConfiguration,
    limit: Int = -1)
    extends PartitionReader[InternalRow] {

  private var emitted = 0

  private val mapper = new ObjectMapper()
  private val fs = new Path(part.path)
    .getFileSystem(hadoopConf.value)
  private val stream = fs.open(new Path(part.path))
  // A partition owns every line that STARTS in [start, end). Standard
  // split protocol: seek to start-1 and peek one byte — if it isn't a
  // newline, the line containing byte start belongs to the previous
  // partition, so discard through its newline. Position accounting is
  // done on RAW BYTES (never on re-encoded decoded text): '\n' (0x0A)
  // cannot occur inside a multi-byte UTF-8 sequence, so byte-scanning
  // is split-safe, and CRLF terminators count their true two bytes.
  private var pos = part.start
  private val in: java.io.BufferedInputStream = {
    var skipPartial = false
    if (part.start > 0) {
      stream.seek(part.start - 1)
      skipPartial = stream.read() != '\n' // raw peek before buffering
    }
    val b = new java.io.BufferedInputStream(stream, 64 << 10)
    if (skipPartial) {
      var c = b.read()
      while (c != -1 && c != '\n') { pos += 1; c = b.read() }
      if (c == '\n') pos += 1
    }
    b
  }
  private val lineBuf = new java.io.ByteArrayOutputStream(256)
  private var current: InternalRow = _

  /** Next line as UTF-8 text (CR stripped), advancing `pos` by the
    * exact on-disk byte count; null at EOF.
    */
  private def readLine(): String = {
    lineBuf.reset()
    var c = in.read()
    if (c == -1) return null
    while (c != -1 && c != '\n') { lineBuf.write(c); c = in.read() }
    pos += lineBuf.size() + (if (c == '\n') 1 else 0)
    val bytes = lineBuf.toByteArray
    val len = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    new String(bytes, 0, len, StandardCharsets.UTF_8)
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (pos < part.end) {
      val line = readLine()
      if (line == null) return false
      if (line.trim.nonEmpty) {
        val node = mapper.readTree(line)
        if (accept(node)) {
          current = project(node)
          emitted += 1
          return true
        }
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()

  // ---- pushed-filter evaluation over the raw JSON node ----

  /** The contract is EQUIVALENCE WITH THE UNPUSHED PLAN: an accepted
    * filter is never re-checked above the scan, so evaluating it here
    * must give exactly what Catalyst would compute over the projected
    * row. Dispatch is on the FILTER VALUE's type (which mirrors the
    * declared column type that produced it) and the node is coerced
    * with the same Jackson accessor [[project]] uses for that type —
    * so a payload that carries a numeric as a quoted string compares
    * as the number project() would emit, never crashes the scan, and
    * never silently string-compares against raw JSON text.
    */
  private def cmp(node: JsonNode, field: String, value: Any): Option[Int] = {
    val n = node.get(field)
    if (n == null || n.isNull) None
    else value match {
      // UTF8String comparison, not Java compareTo: Catalyst orders
      // strings by UTF-8 bytes (code points); UTF-16 code-unit order
      // differs for supplementary characters
      case s: String => Some(UTF8String.fromString(n.asText)
        .compareTo(UTF8String.fromString(s)))
      // integral vs integral must compare as longs: doubles silently
      // collapse neighbours above 2^53 — precision loss here is wrong
      // rows out
      case v: java.lang.Long =>
        Some(java.lang.Long.compare(n.asLong, v.longValue()))
      // an Integer filter value ⇒ the declared column is IntegerType ⇒
      // project() emits n.asInt (truncating) — coerce the SAME way or
      // an out-of-int-range payload value filters differently than the
      // unpushed plan would
      case v: java.lang.Integer =>
        Some(java.lang.Long.compare(n.asInt.toLong, v.longValue()))
      case v: java.lang.Double =>
        Some(java.lang.Double.compare(n.asDouble, v.doubleValue()))
      case b: java.lang.Boolean =>
        Some(java.lang.Boolean.compare(n.asBoolean, b.booleanValue()))
      // pushFilters only accepts the value types handled above; anything
      // else reaching here is a pushdown-contract bug — fail loudly
      case other => sys.error(
        s"dune scan: unpushable filter value ${other.getClass.getName} " +
          "reached the reader (pushFilters must reject it)")
    }
  }

  private def accept(node: JsonNode): Boolean = filters.forall {
    case IsNotNull(f) =>
      val n = node.get(f); n != null && !n.isNull
    case In(f, vs) => vs.exists(v => cmp(node, f, v).contains(0))
    case EqualTo(f, v) => cmp(node, f, v).contains(0)
    case GreaterThan(f, v) => cmp(node, f, v).exists(_ > 0)
    case GreaterThanOrEqual(f, v) => cmp(node, f, v).exists(_ >= 0)
    case LessThan(f, v) => cmp(node, f, v).exists(_ < 0)
    case LessThanOrEqual(f, v) => cmp(node, f, v).exists(_ <= 0)
    case _ => true
  }

  private def project(node: JsonNode): InternalRow =
    InternalRow.fromSeq(schema.fields.toSeq.map { f =>
      val n = node.get(f.name)
      if (n == null || n.isNull) null
      else f.dataType match {
        case LongType => n.asLong()
        case IntegerType => n.asInt()
        case DoubleType => n.asDouble()
        case BooleanType => n.asBoolean()
        case StringType => UTF8String.fromString(n.asText())
        case dt => sys.error(
          s"dune source supports the reference's primitive types; got $dt")
      }
    })
}
