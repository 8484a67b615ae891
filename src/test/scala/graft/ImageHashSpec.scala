package graft

import graft.ops.{ImageHash, PngCodec}

/** Planted-transform contracts for the perceptual-hash image dedup
  * operator (VERDICT r11 task 5): re-encoded / resized / lightly-cropped
  * clones must be found, distinct images must not pair, and the
  * pigeonhole chunk join must equal the brute-force Hamming ball.
  */
class ImageHashSpec extends SparkSpec {

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("dHash is invariant under re-encoding and stable under resize/crop") {
    (0L until 24L).foreach { i =>
      val base = ImageHash.patternImage(i, 128, 96)
      val dBase = ImageHash.dHash64(base)
      // re-encode with a different PNG filter: different bytes, same pixels
      val re = PngCodec.decode(PngCodec.encode(base, filterType = 2)).get
      assert(ImageHash.dHash64(re) == dBase, s"img $i: re-encode changed dHash")
      // 3/4 nearest resize and 2px crop: small Hamming drift only
      val rs = PngCodec.resizeNearest(base, 96, 72)
      assert(hamming(ImageHash.dHash64(rs), dBase) <= 6,
        s"img $i: resize drift ${hamming(ImageHash.dHash64(rs), dBase)}")
      val cr = ImageHash.cropBorder(base, 2)
      assert(hamming(ImageHash.dHash64(cr), dBase) <= 6,
        s"img $i: crop drift ${hamming(ImageHash.dHash64(cr), dBase)}")
    }
  }

  test("aHash agrees with a direct thumbnail replay") {
    val img = ImageHash.patternImage(7L, 128, 96)
    // independent replay of the definition: 8x8 BOX-AVERAGED gray thumb
    // (integer mean luma over each cell's source rectangle), bit set
    // above the integer mean of the 64 cells
    def lum(x: Int, y: Int): Long = {
      val p = (y * img.width + x) * 4
      (299 * (img.rgba(p) & 0xFF) + 587 * (img.rgba(p + 1) & 0xFF) +
        114 * (img.rgba(p + 2) & 0xFF)) / 1000
    }
    val t = (0 until 64).map { k =>
      val cx = k % 8; val cy = k / 8
      val x0 = cx * img.width / 8; val x1 = (cx + 1) * img.width / 8
      val y0 = cy * img.height / 8; val y1 = (cy + 1) * img.height / 8
      val vals = for (y <- y0 until y1; x <- x0 until x1) yield lum(x, y)
      vals.sum / vals.size
    }
    val mean = t.sum / 64
    val expect = t.zipWithIndex.foldLeft(0L) { case (h, (v, k)) =>
      if (v > mean) h | (1L << k) else h
    }
    assert(ImageHash.aHash64(img) == expect)
  }

  test("pigeonhole pair join equals the brute-force Hamming ball") {
    import spark.implicits._
    val corpus = ImageHash.plantedPngCorpus(spark, nBase = 60)
    val hs = ImageHash.pngHashes(corpus, "media_id", "png")
      .select("media_id", "dhash").as[(Long, Long)].collect().toSeq
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib && hamming(ha, hb) <= 6
    } yield (ia, ib, hamming(ha, hb))).toSet
    val got = ImageHash.phashNearDups(
        hs.toDF("media_id", "dhash"), "media_id", "dhash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"pigeonhole diverged: ${got.size} vs ${brute.size}")
  }

  test("planted clones are all found; distinct base images never pair") {
    val off = 1000000L
    val corpus = ImageHash.plantedPngCorpus(spark, nBase = 150, cloneOffset = off)
    val hashes = ImageHash.pngHashes(corpus, "media_id", "png")
    val pairs = ImageHash.phashNearDups(hashes, "media_id", "dhash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 150L).foreach { i =>
      assert(pairs.contains((i, i + off)), s"planted clone of base $i missed")
    }
    // no pair may connect two DIFFERENT base images (directly or via clones)
    val cross = pairs.filter { case (a, b) => a % off != b % off }
    assert(cross.isEmpty, s"distinct bases paired: ${cross.take(5)}")
  }

  test("incremental probe-vs-index matching: every clone hits its own base, only its base") {
    import org.apache.spark.sql.functions._
    val off = 1000000L
    val corpus = ImageHash.plantedPngCorpus(spark, nBase = 120, cloneOffset = off)
    val hashes = ImageHash.pngHashes(corpus, "media_id", "png")
    val matches = ImageHash.phashMatches(
        hashes.filter(col("media_id") >= off), // fresh batch = the clones
        hashes.filter(col("media_id") < off),  // prior corpus = the bases
        "media_id", "dhash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches == (0L until 120L).map(i => (i + off, i)).toSet,
      s"expected each clone matched to exactly its base; got ${matches.size} pairs")
  }
}
