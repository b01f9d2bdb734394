package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("feature extraction: fixed width, L1-normalized, deterministic, one row per asset") {
    val assets = MultimodalOps.mediaAssets(spark, sfDir)
    val f1 = MultimodalOps.extractFeatures(assets)
    assert(f1.count() == assets.count())
    val rows = f1.collect()
    rows.foreach { r =>
      assert(r.feature.length == 16)
      assert(math.abs(r.feature.sum - 1f) < 1e-3, s"not normalized: ${r.feature.sum}")
    }
    val again = MultimodalOps.extractFeatures(MultimodalOps.mediaAssets(spark, sfDir))
      .collect().map(r => r.asset_id -> r.feature.toSeq).toMap
    rows.foreach(r => assert(again(r.asset_id) == r.feature.toSeq))
  }

  test("feature pipeline is map-only: no shuffle exchange in the plan") {
    val plan = MultimodalOps.extractFeatures(MultimodalOps.mediaAssets(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("resize halves metadata dims and shrinks payloads") {
    val assets = MultimodalOps.mediaAssets(spark, sfDir)
    val orig = assets.collect().map(a => a.asset_id -> a).toMap
    MultimodalOps.resize(assets).collect().foreach { r =>
      val o = orig(r.asset_id)
      assert(r.width == math.max(o.width / 2, 1) && r.height == math.max(o.height / 2, 1))
      assert(r.payload.length <= o.payload.length)
      assert(r.payload.nonEmpty)
    }
  }

  test("q94 image path: payloads are genuine PNGs, the JDK codec round-trips them") {
    val assets = MultimodalOps.pngAssets(spark, sfDir).collect()
    assert(assets.nonEmpty)
    assets.take(20).foreach { a =>
      // real PNG container: magic bytes, and the REAL codec decodes it
      assert((a.payload(0) & 0xFF) == 0x89 && a.payload(1) == 'P' &&
        a.payload(2) == 'N' && a.payload(3) == 'G', s"asset ${a.asset_id} not a PNG")
      val img = MultimodalOps.decodeImage(a.payload)
      assert(img.isDefined, s"codec rejected asset ${a.asset_id}")
      assert(img.get.getWidth == a.width && img.get.getHeight == a.height,
        s"asset ${a.asset_id}: decoded ${img.get.getWidth}x${img.get.getHeight}, " +
          s"metadata ${a.width}x${a.height}")
    }
    // decoded stats come from the codec and are deterministic
    val stats = MultimodalOps.imageDecodeStats(spark, sfDir)
    assert(stats.count() == assets.length.toLong)
    val again = MultimodalOps.imageDecodeStats(spark, sfDir).collect().toSeq
    assert(stats.collect().toSeq.sortBy(_.getLong(0)) == again.sortBy(_.getLong(0)))
    // corrupt payloads quarantine (drop), they don't kill the pipeline
    assert(MultimodalOps.decodeImage(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(MultimodalOps.decodeImage(Array.empty[Byte]).isEmpty)
    // q96: real nearest-neighbor resize halves decoded dims and picks
    // exactly the (2x, 2y) source pixels
    val a0 = assets.head
    val img0 = MultimodalOps.decodeImage(a0.payload).get
    val half = MultimodalOps.resizeImage(img0, 2)
    assert(half.getWidth == a0.width / 2 && half.getHeight == a0.height / 2)
    assert((half.getRGB(1, 1) & 0xFF) == (img0.getRGB(2, 2) & 0xFF))
    val rs = MultimodalOps.imageResizeStats(spark, sfDir)
    assert(rs.count() == assets.length.toLong)
  }

  test("q95 audio path: payloads are genuine RIFF/WAVs, the JDK codec round-trips them") {
    val wav = MultimodalOps.syntheticWav(7L)
    // real RIFF container: magic bytes + WAVE form type
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "not a RIFF/WAVE container")
    val dec = MultimodalOps.decodeWav(wav)
    assert(dec.isDefined, "codec rejected its own container")
    val (fmt, pcm) = dec.get
    assert(fmt.getSampleRate == 16000f && fmt.getSampleSizeInBits == 16 &&
      fmt.getChannels == 1 && !fmt.isBigEndian, s"format $fmt")
    assert(pcm.length == (7L % 800 + 400).toInt * 2, s"pcm bytes ${pcm.length}")
    // decoded stats are deterministic and one-per-asset
    val stats = MultimodalOps.audioDecodeStats(spark, sfDir)
    assert(stats.count() == graft.Tables.load(spark, sfDir, "documents").count())
    val again = MultimodalOps.audioDecodeStats(spark, sfDir).collect().toSeq
    assert(stats.collect().toSeq.sortBy(_.getLong(0)) == again.sortBy(_.getLong(0)))
    // corrupt payloads quarantine (drop), they don't kill the pipeline
    assert(MultimodalOps.decodeWav(Array[Byte](82, 73, 70, 70)).isEmpty)
    assert(MultimodalOps.decodeWav(Array.empty[Byte]).isEmpty)
  }

  test("frame sampling: only videos, deterministic frame counts from duration") {
    val assets = MultimodalOps.mediaAssets(spark, sfDir)
    val frames = MultimodalOps.sampleFrames(assets, everyMs = 500)
    val videoIds = assets.filter(_.media_type == "video").collect()
      .map(a => a.asset_id -> a).toMap
    val byAsset = frames.collect().groupBy(_.asset_id)
    assert(byAsset.keySet == videoIds.keySet)
    byAsset.foreach { case (id, fs) =>
      val expected = math.max(videoIds(id).duration_ms / 500, 1)
      assert(fs.length == expected)
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until expected))
      fs.foreach(f => assert(f.frame_bytes.length <= 16))
    }
  }

  test("q106 video: demux + stride sample + frame decode; malformed containers quarantine") {
    // well-formed container round-trips through demux
    val good = MultimodalOps.syntheticGvid(7L)
    val frames = MultimodalOps.demuxGvid(good)
    assert(frames.isDefined && frames.get.size == (7 % 6 + 4))
    // each demuxed frame is a REAL PNG the codec accepts
    frames.get.foreach { f =>
      assert(f.take(4).map(_ & 0xFF).sameElements(Seq(0x89, 0x50, 0x4E, 0x47)),
        "frame is not a PNG stream")
      assert(MultimodalOps.decodeImage(f).isDefined)
    }
    // malformed bytes quarantine (wrong magic, truncation) — never throw
    assert(MultimodalOps.demuxGvid("not a container".getBytes).isEmpty)
    assert(MultimodalOps.demuxGvid(good.take(10)).isEmpty)
    assert(MultimodalOps.demuxGvid(Array.emptyByteArray).isEmpty)
    // stride arithmetic: sampled = ceil(fc / 2) on every asset
    val out = MultimodalOps.videoFrameStats(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (id, fc, ns) =>
      assert(fc == id % 6 + 4, s"asset $id frame count")
      assert(ns == (fc + 1) / 2, s"asset $id sampled count")
    }
  }
}
