package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, FakeCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.queries.Tables(spark, sf, "documents")
  private def assets = Multimodal.assetsFromDocuments(docs)

  test("decode recovers the metadata the container was built with") {
    val metas = Multimodal.decodeAssets(assets, batchSize = 7)
      .collect().map(m => m.asset_id -> m).toMap
    val source = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(metas.size == source.length)
    source.foreach { case (id, text) =>
      val m = metas(id)
      assert(m.media_type == Seq("image", "audio", "video")((id % 3).toInt))
      assert(m.width == (64 + id % 1024).toInt)
      assert(m.height == (64 + id % 768).toInt)
      assert(m.sample_rate == (if (id % 3 == 1) 16000 else 0))
      assert(m.n_bytes == text.getBytes("UTF-8").length.toLong)
    }
  }

  test("decode rejects a payload without the magic header") {
    val bad = spark.createDataset(Seq(Asset(1L, "image", Array[Byte](1, 2, 3))))
    val e = intercept[Exception] {
      Multimodal.decodeAssets(bad).collect()
    }
    assert(e.getMessage.contains("GRMM") ||
      e.getCause != null && e.getCause.getMessage.contains("GRMM"))
  }

  test("sampling every frame reassembles each video body exactly") {
    val frames = Multimodal.sampleFrames(assets, every = 1)
      .collect().groupBy(_.asset_id)
    val videos = assets.filter(_.media_type == "video").collect()
    assert(frames.keySet == videos.filter(_.payload.length > 16)
      .map(_.asset_id).toSet)
    videos.foreach { a =>
      val body = a.payload.drop(Multimodal.HeaderLen)
      if (body.nonEmpty) {
        val got = frames(a.asset_id).sortBy(_.frame_idx)
          .flatMap(_.frame).toArray
        assert(java.util.Arrays.equals(got, body),
          s"asset ${a.asset_id} body mismatch")
      }
    }
  }

  test("features are L1-normalized byte histograms of the body") {
    val feats = Multimodal.extractFeatures(assets, batchSize = 5).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.feature.length == 16)
      assert(math.abs(f.feature.sum - 1f) < 1e-3,
        s"asset ${f.asset_id} histogram sums to ${f.feature.sum}")
    }
    // spot-check one asset against a driver-side recompute
    val a = assets.filter(col("asset_id") === 0L).head()
    assert(feats.find(_.asset_id == 0L).get.feature
      .sameElements(FakeCodec.extract(a.payload)))
  }

  test("resizeImages shrinks body and dims by the factor; non-images untouched") {
    val resized = Multimodal.resizeImages(assets, factor = 4)
    val before = Multimodal.decodeAssets(assets).collect()
      .map(m => m.asset_id -> m).toMap
    val after = Multimodal.decodeAssets(resized).collect()
    after.foreach { m =>
      val b = before(m.asset_id)
      if (b.media_type == "image") {
        assert(m.n_bytes == (b.n_bytes + 3) / 4,
          s"asset ${m.asset_id}: ${b.n_bytes} -> ${m.n_bytes}")
        assert(m.width == (b.width / 4).max(1) && m.height == (b.height / 4).max(1))
      } else {
        assert(m == b, s"non-image asset ${m.asset_id} was modified")
      }
    }
  }

  test("decode repartitions by asset_id (decode work spreads evenly)") {
    val decoded = Multimodal.decodeAssets(assets, partitions = 8)
    assert(decoded.rdd.getNumPartitions == 8)
  }
}
