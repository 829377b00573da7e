package graft.sources

import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
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
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

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
    def exactlyComparable(v: Any): Boolean = v match {
      case _: String | _: java.lang.Long | _: java.lang.Integer |
           _: java.lang.Double | _: java.lang.Boolean => true
      case _ => false
    }
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
    required = requiredSchema

  override def build(): Scan = new DuneScan(required, pushed, path)
}

private class DuneScan(schema: StructType, filters: Array[Filter],
    path: String) extends Scan with Batch {
  // Captured on the driver so executors open the file through the
  // SESSION's Hadoop configuration (S3A credentials, nameservices…) —
  // a bare `new Configuration()` on the executor would drop all of it.
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sparkContext.hadoopConfiguration)

  override def readSchema(): StructType = schema
  override def description(): String =
    s"DuneScan path=$path, PushedFilters=[${filters.mkString(", ")}], " +
      s"ReadSchema=${schema.simpleString}"
  override def toBatch: Batch = this

  /** Byte-range splits; each reader starts at the first line boundary
    * past its offset, so no line is read twice or skipped.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = hadoopConf.value
    val p = new Path(path)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    val targetSplits = math.max(1,
      math.min(SparkSession.active.sparkContext.defaultParallelism,
        (len / (4L << 20)).toInt + 1)) // ≥4 MiB per split
    val step = math.max(1L, len / targetSplits)
    (0L until len by step).map(start =>
      DunePartition(path, start, math.min(start + step, len))
        .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DuneReaderFactory(schema, filters, hadoopConf)
}

private case class DunePartition(path: String, start: Long, end: Long)
    extends InputPartition

private class DuneReaderFactory(schema: StructType, filters: Array[Filter],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DuneReader(schema, filters, p.asInstanceOf[DunePartition], hadoopConf)
}

private class DuneReader(schema: StructType, filters: Array[Filter],
    part: DunePartition,
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

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
    while (pos < part.end) {
      val line = readLine()
      if (line == null) return false
      if (line.trim.nonEmpty) {
        val node = mapper.readTree(line)
        if (accept(node)) {
          current = project(node)
          return true
        }
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()

  // ---- pushed-filter evaluation over the raw JSON node ----

  private def cmp(node: JsonNode, field: String, value: Any): Option[Int] = {
    val n = node.get(field)
    if (n == null || n.isNull) None
    else value match {
      // UTF8String comparison, not Java compareTo: Catalyst orders
      // strings by UTF-8 bytes (code points); UTF-16 code-unit order
      // differs for supplementary characters, and an accepted filter
      // is never re-checked above the scan
      case s: String => Some(UTF8String.fromString(n.asText)
        .compareTo(UTF8String.fromString(s)))
      // integral vs integral must compare as longs: doubles silently
      // collapse neighbours above 2^53, and an accepted filter is NOT
      // re-checked by Catalyst — precision loss here is wrong rows out
      case v: java.lang.Long if n.isIntegralNumber =>
        Some(java.lang.Long.compare(n.asLong, v.longValue()))
      case v: java.lang.Integer if n.isIntegralNumber =>
        Some(java.lang.Long.compare(n.asLong, v.longValue()))
      case v: Number if n.isNumber =>
        Some(java.lang.Double.compare(n.asDouble, v.doubleValue()))
      case b: Boolean => Some(n.asBoolean.compareTo(b))
      // pushFilters only accepts the value types handled above; anything
      // else reaching here is a pushdown-contract bug — fail loudly
      // rather than silently string-compare against raw JSON text
      case other => sys.error(
        s"dune scan: unpushable filter value ${other.getClass.getName} " +
          "reached the reader (pushFilters must reject it)")
    }
  }

  private def accept(node: JsonNode): Boolean = filters.forall {
    case IsNotNull(f) =>
      val n = node.get(f); n != null && !n.isNull
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
