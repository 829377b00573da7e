package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.TableSpec
import graft.operators.Ops

/** Ingestion seam. The reference's source is the Dune Analytics REST API
  * (execute + poll, `dune_extractor.py:44-107`): an opaque saved query id
  * returns JSON rows, optionally delta-filtered server-side by a `date`
  * parameter (`dune_extractor.py:57-59`). The seam is the same here: a
  * query id + optional watermark → DataFrame. HTTP is an ingestion
  * detail, not a plan node — in this zero-egress build the only
  * implementation replays local fixtures.
  */
trait Source {
  def fetch(spark: SparkSession, spec: TableSpec,
      watermark: Option[Any]): DataFrame
}

/** Replays `$baseDir/<query_id>.<json|parquet>` as the query result.
  * The watermark is applied as a pushed-down filter on the *source*
  * column that maps to the spec's watermark column — equivalent to the
  * reference shipping the watermark as a server-side query parameter
  * (`__main__.py:114-123`): only the delta flows downstream.
  */
class FixtureSource(baseDir: String) extends Source {
  override def fetch(spark: SparkSession, spec: TableSpec,
      watermark: Option[Any]): DataFrame = {
    val stem = s"$baseDir/${spec.queryId}"
    val json = new java.io.File(s"$stem.json")
    val df =
      if (json.exists()) spark.read.json(json.getPath)
      else spark.read.parquet(s"$stem.parquet")
    Source.applyWatermark(df, spec, watermark)
  }
}

/** The same seam through the DataSource V2 connector
  * ([[DuneDataSource]], `format("dune")`): the watermark lands as an
  * ordinary Catalyst predicate, and the connector's
  * `SupportsPushDownFilters` carries it into the scan — the full
  * rebuild of the reference's server-side `date` parameter
  * (`dune_extractor.py:57-59`), visible as a pushed filter in explain.
  */
class DuneV2Source(baseDir: String) extends Source {
  override def fetch(spark: SparkSession, spec: TableSpec,
      watermark: Option[Any]): DataFrame = {
    val reader = spark.read.format("dune")
      .option("path", baseDir)
      .option("queryId", spec.queryId.toString)
    // Declared schema ⇒ Spark never calls the provider's inferSchema,
    // so incremental runs skip the O(payload) driver-side JSON pre-pass
    // (DuneDataSourceSpec pins this via DuneDataSource.inferenceRuns).
    val df = spec.sourceSchema.fold(reader)(reader.schema).load()
    Source.applyWatermark(df, spec, watermark)
  }
}

object Source {
  /** Incremental delta filter on the *source-side* column name (the
    * rename map targets are applied later in the pipeline).
    */
  private[sources] def applyWatermark(df: DataFrame, spec: TableSpec,
      watermark: Option[Any]): DataFrame = {
    val sourceWatermarkCol = spec.watermarkCol.map { target =>
      spec.renames.collectFirst { case (s, t) if t == target => s }
        .getOrElse(target)
    }
    sourceWatermarkCol match {
      case Some(c) => Ops.watermarkFilter(df, c, watermark)
      case None    => df
    }
  }
}
