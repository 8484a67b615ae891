package graft

import org.apache.spark.sql.functions._
import graft.ops.{ImageHash, Multimodal, PngCodec, VideoHash}

/** Planted-transform contracts for the video near-dup composition
  * (VERDICT r12 task 7): every whole-video clone (re-encode / resize /
  * crop, last frame swapped) is found at >= 3 of 4 aligned positions,
  * distinct videos never pair, the >=k threshold is load-bearing, and
  * the pigeonhole frame matcher agrees with a brute-force Hamming scan.
  */
class VideoHashSpec extends SparkSpec {

  private val off = 1000000L

  test("planted clones found at >= 3 of 4 aligned frames; no false pairs") {
    val corpus = VideoHash.plantedMp4Corpus(spark, nBase = 60, cloneOffset = off)
    val hashes = VideoHash.frameHashes(corpus)
    // 4 sampled positions per video, every frame decodes
    val perVideo = hashes.groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVideo.size == 120 && perVideo.values.forall(_ == 4L))
    val pairs = VideoHash.videoNearDups(hashes, "media_id",
        minFrames = 3, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    (0L until 60L).foreach { i =>
      assert(pairSet.contains((i, i + off)), s"planted clone of video $i missed")
    }
    // ONLY the planted pairs: distinct videos never pair
    assert(pairs.size == 60, s"false pairs: ${pairSet.size - 60}")
    // the swapped last frame caps every clone at exactly 3 matches
    assert(pairs.forall(_._3 == 3L))
  }

  test("the >= k threshold is load-bearing: minFrames = 4 finds nothing") {
    val corpus = VideoHash.plantedMp4Corpus(spark, nBase = 30, cloneOffset = off)
    val hashes = VideoHash.frameHashes(corpus)
    assert(VideoHash.videoNearDups(hashes, "media_id",
      minFrames = 4, maxHamming = 6).count() == 0L)
  }

  test("pigeonhole frame matching agrees with a brute-force Hamming scan") {
    val corpus = VideoHash.plantedMp4Corpus(spark, nBase = 25, cloneOffset = off)
    val hashes = VideoHash.frameHashes(corpus)
    val rows = hashes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // brute force: per aligned index, all id pairs within Hamming 6,
    // then pairs with >= 3 matching positions
    val byIdx = rows.groupBy(_._2)
    val matched = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byIdx.values.foreach { fs =>
      for (a <- fs; b <- fs if a._1 < b._1
           if java.lang.Long.bitCount(a._3 ^ b._3) <= 6)
        matched((a._1, b._1)) = matched.getOrElse((a._1, b._1), 0) + 1
    }
    val expect = matched.filter(_._2 >= 3).map { case (k, v) => (k._1, k._2, v.toLong) }.toSet
    val got = VideoHash.videoNearDups(hashes, "media_id",
        minFrames = 3, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("clone transforms produce real per-frame drift but never cross Hamming 6") {
    val corpus = VideoHash.plantedMp4Corpus(spark, nBase = 45, cloneOffset = off)
    val hashes = VideoHash.frameHashes(corpus).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    (0L until 45L).foreach { i =>
      (0 until 3).foreach { f =>
        val hm = java.lang.Long.bitCount(hashes((i, f)) ^ hashes((i + off, f)))
        assert(hm <= 6, s"video $i frame $f drifted to Hamming $hm")
      }
    }
    // re-encode clones (i % 3 == 0) are pixel-identical: Hamming 0
    (0L until 45L by 3).foreach { i =>
      (0 until 3).foreach { f =>
        assert(hashes((i, f)) == hashes((i + off, f)))
      }
    }
  }

  test("frames that fail PNG decode are quarantined, not crashed") {
    import spark.implicits._
    // a video whose payload has no embedded PNGs at all: the frame grab
    // falls back to byte windows, none of which decode — zero rows out
    val junk = Seq(Multimodal.MediaRow(7L, "video",
      Multimodal.MediaHeaders.mp4(3001L) ++ Array.fill[Byte](64)(0x41),
      "video/mp4", 0, 0, 3001L)).toDS()
    assert(VideoHash.frameHashes(junk).count() == 0L)
    // and a non-video row emits nothing (sampleFrames contract)
    val img = Seq(Multimodal.MediaRow(8L, "image",
      PngCodec.encode(ImageHash.patternImage(8L, 32, 32)),
      "image/png", 32, 32, 0L)).toDS()
    assert(VideoHash.frameHashes(img).count() == 0L)
  }
}
