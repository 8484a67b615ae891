package graft

import graft.ops.{AudioHash, Multimodal}

/** Planted-transform contracts for the acoustic-fingerprint dedup
  * operator: gain-scaled and decimated clones collapse to their base,
  * distinct recordings never pair, and the WAV round-trip feeds the
  * real PCM parser (not a synthetic array shortcut).
  */
class AudioHashSpec extends SparkSpec {

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
  private def hashOf(samples: Array[Int]): Long =
    AudioHash.energyHash64(
      Multimodal.parseWavPcm(AudioHash.wavPcm16(samples)).get._3)

  test("fingerprint is exactly gain- and decimation-invariant on the planted corpus") {
    (0L until 24L).foreach { i =>
      val base = AudioHash.patternPcm(i)
      val h = hashOf(base)
      assert(hashOf(base.map(_ / 2)) == h, s"rec $i: half gain changed fp")
      assert(hashOf(base.map(_ / 4)) == h, s"rec $i: quarter gain changed fp")
      val dec = base.indices.collect { case k if k % 2 == 0 => base(k) }.toArray
      assert(hashOf(dec) == h, s"rec $i: 2:1 decimation changed fp")
    }
  }

  test("energyHash64 matches a direct frame-energy replay") {
    val s = AudioHash.patternPcm(11L)
    val flen = s.length / 65
    val e = (0 until 65).map(f =>
      (f * flen until (f + 1) * flen).map(k => s(k).toLong * s(k)).sum)
    val expect = (0 until 64).foldLeft(0L)((h, b) =>
      if (e(b) > e(b + 1)) h | (1L << b) else h)
    assert(hashOf(s) == expect)
  }

  test("too-short and undecodable payloads are dropped, not crashed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ADVICE r12 (medium): a short clip used to survive with the 0L
    // sentinel, so EVERY short clip paired with every other at Hamming 0
    // — one false near-dup cluster. Short clips now take the same
    // quarantine path as undecodable payloads.
    val rows = Seq(
      (1L, AudioHash.wavPcm16(AudioHash.patternPcm(1L))),
      (2L, AudioHash.wavPcm16(Array.fill(64)(100))), // < 130 samples: dropped
      (4L, AudioHash.wavPcm16(Array.fill(100)(700))), // < 130 samples: dropped
      (3L, Array[Byte](1, 2, 3, 4))).toDF("media_id", "wav")
    val hashes = AudioHash.wavHashes(rows, "media_id", "wav")
    val got = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L))
    // and therefore the two short clips can never pair as near-dups
    assert(AudioHash.fingerprintNearDups(hashes, "media_id").count() == 0L)
  }

  test("planted clones all found at Hamming 0; distinct recordings never pair") {
    val off = 1000000L
    val corpus = AudioHash.plantedWavCorpus(spark, nBase = 150, cloneOffset = off)
    val hashes = AudioHash.wavHashes(corpus, "media_id", "wav")
    val pairs = AudioHash.fingerprintNearDups(hashes, "media_id", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    (0L until 150L).foreach { i =>
      assert(pairSet.contains((i, i + off)), s"planted clone of rec $i missed")
    }
    pairs.foreach { case (a, b, hm) =>
      if (a % off == b % off) assert(hm == 0, s"planted pair ($a,$b) drifted to $hm")
    }
    val cross = pairSet.filter { case (a, b) => a % off != b % off }
    assert(cross.isEmpty, s"distinct recordings paired: ${cross.take(5)}")
  }
}
