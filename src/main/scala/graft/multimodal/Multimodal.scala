package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * beside typed metadata, with the Spark-side plumbing — schema,
  * partitioning, batched decode seam, frame sampling — real and
  * tested. The actual codec is a deterministic fake ([[FakeCodec]]):
  * this container has no image/audio libraries, so the byte-level
  * decode is stubbed behind the [[Codec]] seam where a JNI/ffmpeg/
  * javax.imageio implementation would plug in. Everything around the
  * seam is the production shape.
  *
  * Container format (the fake "media file", fully deterministic so
  * oracles can recompute sizes arithmetically):
  * {{{
  *   bytes 0-3   magic "GRMM"
  *   byte  4     media kind: 0=image 1=audio 2=video
  *   bytes 5-6   width  (big-endian u16)   — image/video
  *   bytes 7-8   height (big-endian u16)   — image/video
  *   bytes 9-12  sample rate (big-endian u32) — audio
  *   bytes 13-15 reserved
  *   bytes 16…   body (media bytes; for video, frames of 256 bytes)
  * }}}
  *
  * At 100 TB: payloads live in parquet binary columns (or are pointers
  * into an object store, same schema); decode/feature-extract run as
  * `mapPartitions` with bounded in-flight batches so executor memory is
  * `batchSize × assetSize`, not a partition's worth; [[spreadByBytes]]
  * repacks assets into ~equal-byte tasks before decode, so size skew
  * (one 4 GB video beside 4 KB icons) is spread by byte-budget, not row
  * count — a task's input bytes are bounded by
  * `targetBytesPerTask + largest single asset`.
  */
object Multimodal {

  val HeaderLen = 16
  val FrameLen = 256
  val Magic: Array[Byte] = "GRMM".getBytes(StandardCharsets.US_ASCII)

  /** Big-endian u16 header field access — single definition for the
    * codec, the synthesizer, and resize (one place to change if the
    * header layout ever widens).
    */
  private[multimodal] def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private[multimodal] def putU16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >> 8).toByte; b(i + 1) = v.toByte
  }
  private[multimodal] def requireGrmm(bytes: Array[Byte]): Unit =
    require(bytes.length >= HeaderLen && bytes.startsWith(Magic),
      "not a GRMM container")

  case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])
  case class AssetMeta(asset_id: Long, media_type: String, width: Int,
      height: Int, sample_rate: Int, n_bytes: Long, n_frames: Long)
  case class Frame(asset_id: Long, frame_idx: Long, frame: Array[Byte])
  case class AssetFeature(asset_id: Long, media_type: String,
      feature: Array[Float])

  /** The codec seam. `decode` parses container bytes → typed meta;
    * `extract` turns a payload into a fixed-width feature vector (the
    * "model inference" stand-in). Implementations must be pure: decode
    * runs inside executor tasks.
    */
  trait Codec extends Serializable {
    def decode(bytes: Array[Byte]): AssetMeta
    def extract(bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in codec: parses the GRMM header for real,
    * "extracts" a 16-bin byte histogram of the body, L1-normalized —
    * a real embedding model would replace exactly this class.
    */
  object FakeCodec extends Codec {
    private def u32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

    def decode(bytes: Array[Byte]): AssetMeta = {
      requireGrmm(bytes)
      val kind = bytes(4) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"
        case k => sys.error(s"unknown media kind $k")
      }
      val body = bytes.length - HeaderLen
      AssetMeta(-1L, kind, u16(bytes, 5), u16(bytes, 7), u32(bytes, 9),
        body.toLong,
        if (kind == "video") (body + FrameLen - 1) / FrameLen else 0L)
    }

    def extract(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      var i = HeaderLen
      while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(1, bytes.length - HeaderLen).toFloat
      hist.map(_ / n)
    }
  }

  /** Synthesize an assets table from `documents` (the testdata has no
    * binary column): media kind cycles by doc_id; width/height/rate
    * derive from doc_id; body is the doc text's UTF-8 bytes. Built with
    * a typed map — in production this is `spark.read.parquet` over a
    * binary column and this function disappears.
    */
  def assetsFromDocuments(documents: DataFrame): Dataset[Asset] = {
    import documents.sparkSession.implicits._
    documents.select("doc_id", "text").as[(Long, String)].map {
      case (id, text) =>
        val kind = (id % 3).toInt
        val body = text.getBytes(StandardCharsets.UTF_8)
        val h = new Array[Byte](HeaderLen)
        Magic.copyToArray(h)
        h(4) = kind.toByte
        val sr = if (kind == 1) 16000 else 0
        putU16(h, 5, (64 + id % 1024).toInt)
        putU16(h, 7, (64 + id % 768).toInt)
        h(9) = (sr >> 24).toByte; h(10) = (sr >> 16).toByte
        h(11) = (sr >> 8).toByte; h(12) = sr.toByte
        Asset(id, Seq("image", "audio", "video")(kind), h ++ body)
    }
  }

  /** Default byte budget per decode task (64 MiB — half the stock
    * `spark.sql.files.maxPartitionBytes`, leaving headroom for the
    * decoded form beside the raw payload).
    */
  val DefaultBytesPerTask: Long = 64L << 20

  /** Repack assets into ~equal-BYTE tasks (decode cost tracks payload
    * bytes, not row count — one 4 GB video beside 4 KB icons must not
    * land a 4 GB task next to kilobyte tasks). Two passes:
    *
    *  1. per-input-partition byte sums — the driver holds ONE long per
    *     input partition (not per asset, so this scales to billions of
    *     assets);
    *  2. each asset's global cumulative byte offset (partition-prefix
    *     offset + running total within the partition) picks its bucket
    *     `offset / targetBytesPerTask`; an exact bucket-id partitioner
    *     then makes each bucket one task — no hash collisions stacking
    *     two heavy buckets on one core, no range-sampling job.
    *
    * An asset is indivisible, so the hard bound is
    * `task bytes ≤ targetBytesPerTask + largest single asset` (an asset
    * straddling a bucket boundary stays in the bucket where it starts).
    *
    * Both passes run over the SAME materialized RDD object — not the
    * Dataset twice — so they see one fixed partition array: re-planning
    * the Dataset per action (AQE coalescing the final exchange, a
    * different partition count between the two queries) would hand
    * pass 2 partition ids that pass 1 never summed, silently collapsing
    * the spread. Partition MEMBERSHIP is deterministic for a given RDD;
    * intra-partition ORDER need not be — per-partition byte sums are
    * order-independent, and a reordered prefix walk still packs that
    * partition's assets into the same cumulative byte span, so the
    * task-size bound holds regardless.
    */
  def spreadByBytes(assets: Dataset[Asset],
      targetBytesPerTask: Long = DefaultBytesPerTask): Dataset[Asset] = {
    val target = math.max(1L, targetBytesPerTask)
    val rdd = assets.rdd
    val perPart: Array[(Int, Long)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator(pid -> it.map(_.payload.length.toLong).sum)
      }.collect().sortBy(_._1)
    val total = perPart.map(_._2).sum
    if (total == 0L) return assets.coalesce(1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      perPart.map { case (pid, b) => val o = pid -> acc; acc += b; o }.toMap
    }
    val nb = (total + target - 1) / target
    require(nb <= Int.MaxValue, s"spreadByBytes: $nb buckets " +
      s"($total bytes / $target per task) exceeds Int range; raise " +
      "targetBytesPerTask")
    val numBuckets = nb.toInt.max(1)
    val bucketed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets.getOrElse(pid, 0L)
      it.map { a =>
        val b = math.min(cum / target, numBuckets - 1L)
        cum += a.payload.length
        (b, a)
      }
    }
    val packed = bucketed.partitionBy(new org.apache.spark.Partitioner {
      override def numPartitions: Int = numBuckets
      override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
    }).values
    import assets.sparkSession.implicits._
    assets.sparkSession.createDataset(packed)
  }

  /** Batched decode: each partition's assets are decoded in groups of
    * `batchSize` (the shape a batched model server / vectorized codec
    * wants), never materializing the whole partition. Spreads assets
    * into ~equal-byte tasks first ([[spreadByBytes]]) so decode cost —
    * which tracks payload bytes — balances even under heavy size skew;
    * pass `partitions > 0` to force a plain row-hash layout instead
    * (e.g. when upstream already byte-balanced).
    */
  def decodeAssets(assets: Dataset[Asset], codec: Codec = FakeCodec,
      batchSize: Int = 64, partitions: Int = 0,
      targetBytesPerTask: Long = DefaultBytesPerTask): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    val spread =
      if (partitions > 0) assets.repartition(partitions, col("asset_id"))
      else spreadByBytes(assets, targetBytesPerTask)
    spread.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map(a => codec.decode(a.payload)
          .copy(asset_id = a.asset_id, media_type = a.media_type))
      }
    }
  }

  /** Feature extraction through the same batched seam; output is the
    * `(id, Array[Float])` shape the similarity operators consume.
    * Byte-weighted spread, same reasoning as [[decodeAssets]].
    */
  def extractFeatures(assets: Dataset[Asset], codec: Codec = FakeCodec,
      batchSize: Int = 64,
      targetBytesPerTask: Long = DefaultBytesPerTask): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    spreadByBytes(assets, targetBytesPerTask).mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map(a =>
        AssetFeature(a.asset_id, a.media_type, codec.extract(a.payload))))
    }
  }

  /** "Resize" an image asset by an integer factor: keep every
    * `factor`-th body byte and divide the header dims (the real
    * bilinear/ffmpeg scaler plugs into [[Codec]]; the container
    * arithmetic — header rewrite, body length = ceil(n/factor) — is
    * the tested plumbing). A plain per-row map — resize is pure
    * per-asset CPU with no batch-inference seam to feed, unlike
    * [[decodeAssets]]/[[extractFeatures]]. Non-image assets pass
    * through untouched; malformed containers fail the same loud GRMM
    * check as decode.
    */
  def resizeImages(assets: Dataset[Asset], factor: Int): Dataset[Asset] = {
    require(factor >= 1, "factor must be >= 1")
    import assets.sparkSession.implicits._
    assets.map { a =>
      if (a.media_type != "image" || factor == 1) a
      else {
        requireGrmm(a.payload)
        val out = new Array[Byte](
          HeaderLen + (a.payload.length - HeaderLen + factor - 1) / factor)
        System.arraycopy(a.payload, 0, out, 0, HeaderLen)
        putU16(out, 5, (u16(a.payload, 5) / factor).max(1))
        putU16(out, 7, (u16(a.payload, 7) / factor).max(1))
        var i = HeaderLen
        var j = HeaderLen
        while (i < a.payload.length) {
          out(j) = a.payload(i); i += factor; j += 1
        }
        a.copy(payload = out)
      }
    }
  }

  /** Sample every `every`-th frame of each video asset (a real pipeline
    * decodes keyframes; the container's frames are fixed 256-byte
    * slices, so the slicing arithmetic is oracle-checkable). Emits one
    * row per sampled frame — flatMap, so no per-asset frame list is
    * ever held in memory.
    */
  def sampleFrames(assets: Dataset[Asset], every: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val body = a.payload.length - HeaderLen
      val n = (body + FrameLen - 1) / FrameLen
      (0L until n.toLong).iterator.filter(_ % every == 0).map { i =>
        val from = HeaderLen + (i * FrameLen).toInt
        Frame(a.asset_id, i,
          java.util.Arrays.copyOfRange(a.payload, from,
            math.min(from + FrameLen, a.payload.length)))
      }
    }
  }
}
