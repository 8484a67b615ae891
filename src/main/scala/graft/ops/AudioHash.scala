package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Acoustic fingerprinting + near-duplicate detection — the audio twin
  * of [[ImageHash]] (and the energy-profile core of the chromaprint
  * family): a re-gained or resampled copy of a recording must collapse
  * to the same near-dup group even though its BYTES share nothing.
  *
  * Signature: 64-bit ENERGY-DERIVATIVE hash over real decoded PCM16
  * ([[Multimodal.parseWavPcm]]): cut the stream into 65 equal frames,
  * bit f = energy(frame f) > energy(frame f+1). Frames are exactly
  * equal-length (the tail remainder is dropped), so the comparison is
  * raw-integer-sum exact and GAIN-INVARIANT by construction — scaling
  * every sample scales both sides of each comparison identically, and
  * equal-energy ties stay ties. Resampling preserves relative frame
  * positions, so the energy profile (and its derivative signs) survives.
  * Time-SHIFTED copies are out of scope for a frame-aligned profile
  * hash — the same limitation the production fingerprinters solve with
  * overlapping windows at 10x the compute.
  *
  * Pair generation reuses [[ImageHash.phashNearDups]] — the 8×8-bit
  * pigeonhole chunk join is generic over any 64-bit signature column
  * (exact for Hamming ≤ 7, one shuffle, 8 rows per recording).
  */
object AudioHash {

  /** 64-bit energy-derivative fingerprint. 0L is a RESERVED sentinel
    * returned when the clip is too short to frame (fewer than 130
    * samples = 65 frames of ≥2); [[wavHashes]] treats such clips like
    * undecodable payloads (quarantine) — keeping them would pair every
    * short clip with every other at Hamming 0 and collapse them into
    * one false near-dup cluster (ADVICE r12, medium). */
  def energyHash64(samples: Array[Int]): Long = {
    val frames = 65
    val flen = samples.length / frames
    if (flen < 2) return 0L
    val e = new Array[Long](frames)
    var f = 0
    while (f < frames) {
      var s = 0L
      var i = f * flen
      val end = i + flen
      while (i < end) { val v = samples(i).toLong; s += v * v; i += 1 }
      e(f) = s
      f += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (e(b) > e(b + 1)) h |= 1L << b
      b += 1
    }
    h
  }

  /** Decode + hash a WAV corpus: (id, wav binary) → (id, ahash64).
    * Row-local binary work via mapPartitions (the sanctioned multimodal
    * decode shape); undecodable payloads AND too-short-to-frame clips
    * (< 130 samples, the [[energyHash64]] 0L sentinel) are dropped to
    * the same quarantine path — a frameless clip carries no signal, and
    * keeping the sentinel would cluster all short clips together.
    */
  def wavHashes(audio: DataFrame, idCol: String, wavCol: String): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col(idCol).cast("long"), col(wavCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, wav) =>
        Multimodal.parseWavPcm(wav).collect {
          case (_, _, samples) if samples.length >= 130 =>
            (id, energyHash64(samples))
        }
      })
      .toDF(idCol, "fp")
  }

  /** Near-dup pairs over the fingerprint column — the pigeonhole join
    * is signature-agnostic, shared with the image path. */
  def fingerprintNearDups(hashes: DataFrame, idCol: String,
      maxHamming: Int = 6): DataFrame =
    ImageHash.phashNearDups(hashes, idCol, "fp", maxHamming)

  // ---- deterministic planted-transform corpus (the q224 surface) ------

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Minimal PCM16 mono WAV encoder (RIFF + fmt + data). */
  def wavPcm16(samples: Array[Int], rate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => out.putShort(s.toShort))
    out.array()
  }

  /** Per-recording square-wave signal whose 65-frame amplitude profile
    * is hash-random TWO-LEVEL (quiet 600 / loud 12000): frame energies
    * are exactly amp² per sample, so equal-amp ties compare equal under
    * any exact gain and a 2:1 decimation (period-4 square → period-2,
    * same amplitude) — the audio analogue of [[ImageHash.patternImage]]'s
    * binary value-noise.
    */
  private[graft] def patternPcm(i: Long, samplesPerFrame: Int = 128): Array[Int] = {
    val frames = 65
    val n = frames * samplesPerFrame
    val out = new Array[Int](n)
    var f = 0
    while (f < frames) {
      val amp = if ((mix(i * 6007L + f) & 1L) == 0L) 600 else 12000
      var k = 0
      while (k < samplesPerFrame) {
        // period-4 square wave: + + - -
        out(f * samplesPerFrame + k) = if ((k & 2) == 0) amp else -amp
        k += 1
      }
      f += 1
    }
    out
  }

  /** `nBase` distinct recordings plus planted clones: every third base
    * gains a half-gain copy (exact energy scale ×1/4), every third+1 a
    * 2:1 decimation, every third+2 a quarter-gain copy. Clone id =
    * base id + `cloneOffset`. Fully deterministic. */
  def plantedWavCorpus(spark: SparkSession, nBase: Int,
      cloneOffset: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val rows = (0L until nBase.toLong).flatMap { i =>
      val base = patternPcm(i)
      val clone = (i % 3) match {
        case 0 => base.map(_ / 2)
        case 1 => base.indices.collect { case k if k % 2 == 0 => base(k) }.toArray
        case _ => base.map(_ / 4)
      }
      Seq((i, wavPcm16(base)), (i + cloneOffset, wavPcm16(clone)))
    }
    rows.toDF("media_id", "wav")
  }
}
