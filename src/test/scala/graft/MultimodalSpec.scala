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

  test("spreadByBytes: one asset 1000x larger doesn't skew task input bytes") {
    def mk(id: Long, bodyLen: Int): Asset = {
      val h = new Array[Byte](Multimodal.HeaderLen)
      Multimodal.Magic.copyToArray(h)
      Asset(id, "image", h ++ Array.fill[Byte](bodyLen)((id % 251).toByte))
    }
    val small = (1L to 6000L).map(mk(_, 512))
    val big = mk(0L, 512 * 1000) // 1000x the small body size
    val assets = spark.createDataset(big +: small).repartition(8)

    val target = 1L << 20
    val spread = Multimodal.spreadByBytes(assets, target)
    val bytesPerTask = spread.mapPartitions(it =>
      Iterator.single(it.map(_.payload.length.toLong).sum)).collect()
    val mean = bytesPerTask.sum.toDouble / bytesPerTask.length
    assert(bytesPerTask.max <= 2.0 * mean,
      s"max task ${bytesPerTask.max} bytes vs mean $mean " +
        s"(layout: ${bytesPerTask.mkString(",")})")
    // hard bound regardless of where the big asset lands
    assert(bytesPerTask.max <= target + big.payload.length)
    // nothing lost or duplicated by the repack
    assert(spread.count() == 6001)
    assert(spread.select("asset_id").as[Long].collect().sorted.toSeq ==
      (0L to 6000L).toSeq)
    // the row-count spread this replaces would put the big asset's task
    // far above the byte mean — the property the fix exists for
    val rowSpread = assets.repartition(4, col("asset_id"))
    val rowBytes = rowSpread.mapPartitions(it =>
      Iterator.single(it.map(_.payload.length.toLong).sum)).collect()
    val rowMean = rowBytes.sum.toDouble / rowBytes.length
    assert(rowBytes.max > 1.3 * rowMean,
      "row-hash layout unexpectedly byte-balanced; skew fixture too weak")
  }
}
