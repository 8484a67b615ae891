package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video near-duplicate detection — the last cell of the multimodal
  * dedup matrix (text q36-39, image q221, audio q224): a re-encoded,
  * resized, or lightly-cropped copy of a VIDEO must collapse to the
  * same near-dup group even though its container bytes share nothing.
  *
  * Pure composition of two proven parts (VERDICT r12 task 7):
  * [[Multimodal.sampleFrames]] extracts real embedded-PNG keyframes at
  * a fixed sampling cadence, [[ImageHash.dHash64]] turns each decoded
  * frame into a 64-bit perceptual signature, and the pair generation is
  * q221's 8×8-bit pigeonhole join — run PER FRAME INDEX. Two videos are
  * near-dups when at least `minFrames` aligned sample positions match
  * within Hamming `maxHamming`.
  *
  * ALIGNED-index matching, by design: the clone transforms that matter
  * for corpus dedup (re-encode, rescale, crop, watermark) preserve the
  * timeline, so frame i of the copy corresponds to frame i of the
  * original, and keying the join on (frame_idx, chunk, value) both
  * tightens the buckets (frames of unrelated sample positions never
  * meet) and makes the ≥k rule exact. Time-SHIFTED copies are out of
  * scope for an aligned matcher — the same documented limitation as
  * [[AudioHash]]'s frame-aligned energy profile; production systems
  * solve it with overlapping windows at a constant-factor more compute,
  * which drops into the same plumbing by emitting shifted copies of the
  * frame rows.
  *
  * Scale shape: one row per sampled frame (bounded by `maxFrames` per
  * video — a 10-hour outlier cannot fan out unboundedly), 8 chunk rows
  * per frame, one equi-join shuffle on (frame_idx, chunk, value), and a
  * (video_a, video_b)-keyed count. Nothing is corpus-quadratic; decode
  * cost dominates and is embarrassingly row-local.
  */
object VideoHash {

  /** Per-sampled-frame perceptual hashes: (media_id, frame_idx, dhash).
    * Frames whose payload does not decode as PNG are dropped — the same
    * quarantine convention as [[ImageHash.pngHashes]] (an undecodable
    * frame carries no comparable signal). */
  def frameHashes(media: Dataset[Multimodal.MediaRow],
      everyMs: Long = 1000L, maxFrames: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Multimodal.sampleFrames(media, everyMs, maxFrames)
      .mapPartitions(_.flatMap { fr =>
        PngCodec.decode(fr.frame_payload)
          .map(img => (fr.media_id, fr.frame_idx, ImageHash.dHash64(img)))
      })
      .toDF("media_id", "frame_idx", "dhash")
  }

  /** Near-dup video pairs over a frame-hash table: every (id_a < id_b)
    * pair with >= `minFrames` aligned frame positions within Hamming
    * `maxHamming` (exact for maxHamming <= 7 — the 8-chunk pigeonhole).
    * Output: (id_a, id_b, n_frames, max_hamming) with n_frames = the
    * number of matching aligned positions. */
  def videoNearDups(frameHashes: DataFrame, idCol: String,
      minFrames: Int = 3, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"pigeonhole over 8 chunks is exact only for maxHamming <= 7, got $maxHamming")
    require(minFrames >= 1, s"minFrames must be >= 1, got $minFrames")
    val chunks = frameHashes.select(col(idCol).as("id"),
      col("frame_idx"), col("dhash").as("ph"),
      explode(array((0 until 8).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("dhash"), c * 8).bitwiseAND(0xFFL).as("ch"))
      }: _*)).as("c"))
      .select(col("id"), col("frame_idx"), col("ph"),
        col("c.chunk").as("chunk"), col("c.ch").as("ch"))
    val l = chunks.select(col("frame_idx"), col("chunk"), col("ch"),
      col("id").as("id_a"), col("ph").as("ph_a"))
    val r = chunks.select(col("frame_idx"), col("chunk"), col("ch"),
      col("id").as("id_b"), col("ph").as("ph_b"))
    // first-agreeing-chunk rule: each qualifying frame pair is emitted
    // by exactly ONE bucket — no distinct (the q221 discipline)
    val firstCollidingChunk = (0 until 8).reverse
      .foldLeft(lit(-1)) { (acc, c) =>
        when(shiftright(col("ph_a"), c * 8).bitwiseAND(0xFFL) ===
          shiftright(col("ph_b"), c * 8).bitwiseAND(0xFFL), c).otherwise(acc)
      }
    val framePairs = l.join(r, Seq("frame_idx", "chunk", "ch"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("chunk") === firstCollidingChunk)
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "frame_idx", "hamming")
    framePairs.groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("n_frames"),
        max("hamming").as("max_hamming"))
      .filter(col("n_frames") >= minFrames)
  }

  // ---- deterministic planted-transform corpus (the q233 surface) ------

  /** Embedded-keyframe MP4 for the planted corpus: a real mvhd header
    * (duration chosen so [[Multimodal.sampleFrames]] at 1000 ms yields
    * exactly `frames.length` samples) followed by one complete PNG per
    * keyframe — the container shape the frame grab walks. */
  private def mp4WithFrames(frames: Seq[PngCodec.Image]): Array[Byte] =
    Multimodal.MediaHeaders.mp4((frames.length - 1) * 1000L + 1) ++
      frames.flatMap(PngCodec.encode(_)).toArray

  /** `nBase` distinct 4-keyframe videos plus planted clones. Frame f of
    * video i is [[ImageHash.patternImage]] seeded by (i, f) — two-level
    * value noise, so different videos' frame hashes are ~independent
    * 64-bit draws. The clone (id = base + `cloneOffset`) applies one
    * whole-video transform — re-encode (i%3==0), 3/4 nearest resize
    * (i%3==1), 2px border crop (i%3==2) — and REPLACES its last frame
    * with a fresh image: only 3 of 4 aligned positions match, so the
    * ≥3-of-4 rule is exercised on every clone, and a ≥4 threshold must
    * find nothing. Fully deterministic, no RNG. */
  def plantedMp4Corpus(spark: SparkSession, nBase: Int,
      cloneOffset: Long = 1000000L): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    spark.range(nBase.toLong).flatMap { i =>
      val baseFrames = (0 until 4).map(f =>
        ImageHash.patternImage(i * 37L + f, 128, 96))
      val cloneKept = baseFrames.take(3).map { img =>
        (i % 3) match {
          case 0 => img // re-encode below picks a different filter type
          case 1 => PngCodec.resizeNearest(img, 96, 72)
          case _ => ImageHash.cropBorder(img, 2)
        }
      }
      val cloneFrames = cloneKept :+ ImageHash.patternImage(i * 37L + 1000L, 128, 96)
      val basePayload = mp4WithFrames(baseFrames)
      val clonePayload = Multimodal.MediaHeaders.mp4(3001L) ++
        cloneFrames.flatMap(img => PngCodec.encode(img,
          filterType = if (i % 3 == 0) 2 else 0)).toArray
      Seq(
        Multimodal.MediaRow(i, "video", basePayload, "video/mp4", 128, 96, 3001L),
        Multimodal.MediaRow(i + cloneOffset, "video", clonePayload,
          "video/mp4", 128, 96, 3001L))
    }
  }
}
