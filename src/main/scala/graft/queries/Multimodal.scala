package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal => MM}

/** Multimodal plumbing as declared queries. The GRMM container format
  * is deterministic arithmetic over the source text (see
  * [[graft.multimodal.Multimodal]]), so the decode and frame-sampling
  * paths get real SQL oracles: DuckDB recomputes sizes/frame counts
  * from `strlen(text)` while Spark actually builds, decodes, and
  * slices the binary payloads — the equality proves the byte plumbing.
  */
object Multimodal {

  private def assets(spark: SparkSession, dir: String) =
    MM.assetsFromDocuments(Tables(spark, dir, "documents"))

  /** Decode every asset through the batched codec seam, aggregate the
    * recovered metadata per media type.
    */
  private def decodeStats(spark: SparkSession, dir: String): DataFrame =
    MM.decodeAssets(assets(spark, dir))
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_assets"),
        sum("n_bytes").as("total_bytes"),
        max("width").as("max_width"),
        sum("n_frames").as("total_frames"))
      .orderBy("media_type")

  private val decodeStatsSql =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS media_type,
      |  count(*) AS n_assets,
      |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
      |  max(64 + doc_id % 1024) AS max_width,
      |  CAST(sum(CASE WHEN doc_id % 3 = 2
      |    THEN CAST(ceil(strlen(text) / 256.0) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS total_frames
      |FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin

  /** Sample every 4th frame of each video asset; per-asset counts and
    * byte totals must equal DuckDB's closed-form arithmetic.
    */
  private def frameSample(spark: SparkSession, dir: String): DataFrame =
    MM.sampleFrames(assets(spark, dir), every = 4)
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_sampled"),
        sum(length(col("frame"))).as("sampled_bytes"))
      .orderBy("asset_id")

  private val frameSampleSql =
    """WITH v AS (
      |  SELECT doc_id, strlen(text) AS b,
      |    CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS nf
      |  FROM documents WHERE doc_id % 3 = 2 AND strlen(text) > 0)
      |SELECT doc_id AS asset_id, (nf - 1) // 4 + 1 AS n_sampled,
      |  ((nf - 1) // 4) * 256 + CASE WHEN (nf - 1) % 4 = 0
      |    THEN b - (nf - 1) * 256 ELSE 256 END AS sampled_bytes
      |FROM v ORDER BY asset_id""".stripMargin

  /** Resize images by 4× through the codec seam, then decode the
    * resized containers: recovered byte counts must equal the
    * closed-form ceil(n/4) arithmetic (images) / untouched sizes
    * (audio/video).
    */
  private def resizeStats(spark: SparkSession, dir: String): DataFrame =
    MM.decodeAssets(MM.resizeImages(assets(spark, dir), factor = 4))
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_assets"),
        sum("n_bytes").as("total_bytes"),
        max("width").as("max_width"))
      .orderBy("media_type")

  private val resizeStatsSql =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS media_type,
      |  count(*) AS n_assets,
      |  CAST(sum(CASE WHEN doc_id % 3 = 0
      |    THEN CAST(ceil(strlen(text) / 4.0) AS BIGINT)
      |    ELSE strlen(text) END) AS BIGINT) AS total_bytes,
      |  max(CASE WHEN doc_id % 3 = 0
      |    THEN greatest((64 + doc_id % 1024) // 4, 1)
      |    ELSE 64 + doc_id % 1024 END) AS max_width
      |FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin

  /** Per-media-type centroid of the extracted 16-bin features (the
    * "model inference" path end-to-end). The fake extractor's output is
    * not SQL-expressible — rows-only check; the spec pins its values.
    */
  private def featureCentroids(spark: SparkSession, dir: String): DataFrame =
    MM.extractFeatures(assets(spark, dir)).toDF()
      .select(col("media_type"), posexplode(col("feature")))
      .groupBy("media_type", "pos")
      .agg(round(avg("col"), 6).as("avg_weight"))
      .orderBy("media_type", "pos")

  /** ViT-style patch-grid planning: each decoded image yields its
    * 16×16 patch grid (nx, ny, n_patches) — the pre-tokenization a
    * vision-transformer pipeline runs before pixel work. The dims come
    * from Spark actually PARSING the binary header through the codec
    * seam; DuckDB recomputes the grid closed-form from the synthesis
    * arithmetic. Pure per-row projection after decode — no shuffle
    * before the output sort; at scale the patch fan-out (explode to
    * nx×ny rows) happens inside the same map stage as the decode.
    */
  private def patchGrid(spark: SparkSession, dir: String): DataFrame =
    MM.decodeAssets(assets(spark, dir))
      .filter(col("media_type") === "image")
      .select(col("asset_id"),
        floor(col("width") / 16).cast("bigint").as("nx"),
        floor(col("height") / 16).cast("bigint").as("ny"),
        (floor(col("width") / 16) * floor(col("height") / 16))
          .cast("bigint").as("n_patches"))
      .orderBy("asset_id")

  private val patchGridSql =
    """SELECT doc_id AS asset_id,
      |  (64 + doc_id % 1024) // 16 AS nx,
      |  (64 + doc_id % 768) // 16 AS ny,
      |  ((64 + doc_id % 1024) // 16) * ((64 + doc_id % 768) // 16)
      |    AS n_patches
      |FROM documents WHERE doc_id % 3 = 0
      |ORDER BY asset_id""".stripMargin

  /** Content-hash dedup ACROSS modalities: group assets by md5 of the
    * decoded body (payload minus the 16-byte container header) — the
    * same bytes can ship as image, audio, or video containers, and
    * content identity must see through the wrapper. Emitting the hex
    * digest itself makes the oracle compare prove byte-exact payload
    * round-tripping through the container seam (DuckDB hashes the raw
    * text bytes; Spark hashes what it unpacks). One hash shuffle,
    * deterministic survivor — the exact-dedup discipline applied to
    * binary columns. At 100 TB the md5 column is computed at ingest
    * and persisted; this is the query side.
    */
  private def mmDedup(spark: SparkSession, dir: String): DataFrame = {
    val a = assets(spark, dir).toDF()
    // re-ingest scenario: every 10th asset arrives again under a fresh
    // id (the double-upload / re-crawl case content dedup exists for);
    // the original must survive as the keeper
    val reingested = a.filter(col("asset_id") % 10 === 0)
      .withColumn("asset_id", col("asset_id") + 1000000L)
    a.unionByName(reingested)
      .select(col("asset_id"),
        md5(expr("substring(payload, 17)")).as("content_md5"),
        (length(col("payload")) - 16).as("n_bytes"))
      .groupBy("content_md5")
      .agg(min("asset_id").as("keep_id"),
        count(lit(1)).as("dup_count"), min("n_bytes").as("n_bytes"))
      .filter(col("dup_count") > 1)
      .select("keep_id", "content_md5", "dup_count", "n_bytes")
      .orderBy("keep_id")
  }

  private val mmDedupSql =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
      |h AS (SELECT doc_id, md5(text) AS content_md5,
      |    strlen(text) AS n_bytes
      |  FROM d)
      |SELECT min(doc_id) AS keep_id, content_md5,
      |  count(*) AS dup_count, CAST(min(n_bytes) AS BIGINT) AS n_bytes
      |FROM h GROUP BY content_md5 HAVING count(*) > 1
      |ORDER BY keep_id""".stripMargin

  /** Aspect-ratio bucketing for vision training (the SDXL-style batch
    * shaping step): images/videos batch together only with near-equal
    * aspect ratios, so one bucket's batch needs no destructive
    * crop/pad to a common shape. Ratio is the INTEGER
    * `width·1000 div height` (exact in both engines — a double ratio
    * would round-split at bucket edges), bucketed tall / square /
    * wide; the per-bucket audit reports asset counts, the ratio
    * span actually observed, total pixels, and the resulting batch
    * count at batch size 32 (`(n+31) div 32`). Width/height come from
    * the DECODED container header — the oracle recomputes them from
    * the generator arithmetic, so equality proves the byte plumbing
    * again on a new read path. Scale: one decode pass (metadata-only
    * projection), one bucket-keyed fold — batch assignment downstream
    * is `row_number() div 32` within each bucket, embarrassingly
    * parallel.
    */
  private def aspectBuckets(spark: SparkSession, dir: String): DataFrame =
    MM.decodeAssets(assets(spark, dir))
      .filter(col("media_type").isin("image", "video"))
      .withColumn("ratio_e3",
        expr("(width * 1000L) div height"))
      .withColumn("bucket",
        when(col("ratio_e3") < 750, "tall")
          .when(col("ratio_e3") < 1333, "square")
          .otherwise("wide"))
      // second axis: resolution-area bucket (batching by resolution
      // bounds the padding waste within a batch even at equal aspect —
      // and THIS fixture is all-square by construction, w ≡ h for
      // doc_id < 768, which the aspect column honestly reports)
      .withColumn("area_bucket",
        when(col("width").cast("long") * col("height") < 40000L, "small")
          .when(col("width").cast("long") * col("height") < 160000L,
            "medium")
          .otherwise("large"))
      .groupBy("media_type", "bucket", "area_bucket")
      .agg(count(lit(1)).as("n_assets"),
        min("ratio_e3").as("min_ratio_e3"),
        max("ratio_e3").as("max_ratio_e3"),
        sum(col("width").cast("long") * col("height")).as("total_px"),
        expr("(count(1) + 31) div 32").as("n_batches"))
      .orderBy("media_type", "bucket", "area_bucket")

  private val aspectBucketsSql =
    """WITH dims AS (
      |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' ELSE 'video' END
      |      AS media_type,
      |    64 + doc_id % 1024 AS w, 64 + doc_id % 768 AS h
      |  FROM documents WHERE doc_id % 3 IN (0, 2)),
      |r AS (SELECT media_type, w, h, (w * 1000) // h AS ratio_e3
      |  FROM dims),
      |b AS (SELECT media_type,
      |    CASE WHEN ratio_e3 < 750 THEN 'tall'
      |         WHEN ratio_e3 < 1333 THEN 'square'
      |         ELSE 'wide' END AS bucket,
      |    CASE WHEN w * h < 40000 THEN 'small'
      |         WHEN w * h < 160000 THEN 'medium'
      |         ELSE 'large' END AS area_bucket,
      |    ratio_e3, w, h
      |  FROM r)
      |SELECT media_type, bucket, area_bucket, count(*) AS n_assets,
      |  min(ratio_e3) AS min_ratio_e3, max(ratio_e3) AS max_ratio_e3,
      |  CAST(sum(w * h) AS BIGINT) AS total_px,
      |  (count(*) + 31) // 32 AS n_batches
      |FROM b GROUP BY 1, 2, 3
      |ORDER BY media_type, bucket, area_bucket""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("mm_aspect_buckets", aspectBuckets,
      Some(aspectBucketsSql)),
    NamedQuery("mm_dedup", mmDedup, Some(mmDedupSql)),
    NamedQuery("mm_patch_grid", patchGrid, Some(patchGridSql)),
    NamedQuery("mm_decode_stats", decodeStats, Some(decodeStatsSql)),
    NamedQuery("mm_frame_sample", frameSample, Some(frameSampleSql)),
    NamedQuery("mm_resize_stats", resizeStats, Some(resizeStatsSql)),
    NamedQuery("mm_feature_centroids", featureCentroids, None))
}
