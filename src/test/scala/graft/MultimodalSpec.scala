package graft
import org.apache.spark.sql.functions._
import graft.ops.{AsofJoin, Multimodal, Sessionize}

class MultimodalSpec extends SparkSpec {
  import graft.ops.Multimodal.{MediaCodec, MediaHeaders}

  test("codec features are deterministic and batch plumbing works") {
    val a = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 200))
      .collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 200))
      .collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => f.brightness >= 0 && f.brightness <= 1))
    assert(a.forall(f => f.byte_len >= 44 && f.byte_len < 16384))
    // video sampling uses duration; image samples exactly one frame
    assert(a.filter(_.kind == "image").forall(_.n_frames_sampled == 1))
    assert(a.filter(_.kind == "video").forall(_.n_frames_sampled >= 1))
  }

  test("header codec parses real PNG/WAV/MP4 headers and matches metadata") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 200))
      .collect()
    // every synthetic payload carries a genuine container header encoding
    // its declared metadata — the parser must recover it for ALL rows
    assert(feats.forall(_.meta_consistent), feats.filterNot(_.meta_consistent).take(3).toSeq)
    assert(feats.filter(_.kind == "image").forall(f =>
      f.parsed_width >= 8 && f.parsed_height >= 8))
    assert(feats.filter(_.kind != "image").forall(f => f.parsed_duration_ms >= 1000))
    assert(feats.filter(_.kind == "audio").forall(f => f.parsed_width == -1))
  }

  test("JPEG parser: JFIF fixture round-trips; corrupt/truncated parse to None") {
    // round-trip at several dims incl. the be16 boundary cases
    Seq((640, 480), (1, 1), (255, 256), (65535, 65535)).foreach { case (w, h) =>
      assert(MediaCodec.parseJpeg(MediaHeaders.jpeg(w, h)).contains((w, h)), s"$w x $h")
    }
    // trailing garbage after the header (the synthetic corpus shape) is fine
    assert(MediaCodec.parseJpeg(MediaHeaders.jpeg(30, 20) ++
      Array.fill[Byte](50)(0x3A)).contains((30, 20)))
    // 0xFF fill bytes before a marker are legal padding
    val f = MediaHeaders.jpeg(12, 34)
    val padded = f.take(2) ++ Array(0xFF, 0xFF).map(_.toByte) ++ f.drop(2)
    assert(MediaCodec.parseJpeg(padded).contains((12, 34)))
    // corrupt cases: wrong magic, truncation inside SOF, SOS before SOF,
    // a length that walks off the end, and empty input — all None, no throw
    assert(MediaCodec.parseJpeg(MediaHeaders.png(10, 10)).isEmpty)
    // truncated INSIDE the SOF dims (SOF marker at 21, dims end at 28)
    assert(MediaCodec.parseJpeg(f.take(26)).isEmpty)
    val sosEarly = Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x01, 0x02).map(_.toByte)
    assert(MediaCodec.parseJpeg(sosEarly).isEmpty)
    val hugeLen = Array(0xFF, 0xD8, 0xFF, 0xE0, 0xFF, 0xFF).map(_.toByte)
    assert(MediaCodec.parseJpeg(hugeLen).isEmpty)
    assert(MediaCodec.parseJpeg(Array.empty[Byte]).isEmpty)
    // resize header-patch rewrites the SOF dims in place
    import spark.implicits._
    val row = Multimodal.MediaRow(7L, "image", MediaHeaders.jpeg(100, 80),
      "image/jpeg", 100, 80, 0L)
    val out = Multimodal.resizeImages(spark.createDataset(Seq(row)), 32, 24)
      .collect()(0)
    assert(MediaCodec.parseJpeg(out.payload).contains((32, 24)))
    assert(out.payload.length == row.payload.length, "fallback only patches the header")
  }

  test("PNG parser: hand-built header round-trips; corrupt bytes parse to None") {
    assert(MediaCodec.parsePng(MediaHeaders.png(640, 480)).contains((640, 480)))
    assert(MediaCodec.parsePng(MediaHeaders.png(1, 1)).contains((1, 1)))
    assert(MediaCodec.parsePng(MediaHeaders.bmp(640, 480)).isEmpty) // wrong magic
    assert(MediaCodec.parsePng(MediaHeaders.png(640, 480).take(20)).isEmpty) // truncated
    assert(MediaCodec.parsePng(Array.empty[Byte]).isEmpty)
  }

  test("GIF parser: header fixture round-trips; garbage refused") {
    assert(MediaCodec.parseGif(MediaHeaders.gif(320, 200)).contains((320, 200)))
    assert(MediaCodec.parseGif(MediaHeaders.gif(1, 1)).contains((1, 1)))
    assert(MediaCodec.parseGif(MediaHeaders.gif(65535, 65535)).contains((65535, 65535)))
    assert(MediaCodec.parseGif(MediaHeaders.png(8, 8)).isEmpty) // wrong magic
    assert(MediaCodec.parseGif("GIF88a".getBytes("US-ASCII") ++
      Array.fill[Byte](8)(1)).isEmpty) // unknown version
    assert(MediaCodec.parseGif(MediaHeaders.gif(320, 200).take(9)).isEmpty)
    assert(MediaCodec.parseGif(Array.empty[Byte]).isEmpty)
  }

  test("BMP parser: little-endian dims, top-down (negative height) normalized") {
    assert(MediaCodec.parseBmp(MediaHeaders.bmp(800, 600)).contains((800, 600)))
    val topDown = MediaHeaders.bmp(800, -600)
    assert(MediaCodec.parseBmp(topDown).contains((800, 600)))
    assert(MediaCodec.parseBmp(MediaHeaders.png(8, 8)).isEmpty)
  }

  test("corrupt u32 length fields near 2^32 neither hang nor throw") {
    def le(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    // WAV chunk length 0xFFFFFFF8: as Int that's -8, which once made the
    // chunk walk advance by zero and spin forever
    val evilWav = ascii("RIFF") ++ le(36) ++ ascii("WAVE") ++
      ascii("JUNK") ++ le(0xFFFFFFF8L) ++ Array.fill[Byte](24)(0)
    assert(MediaCodec.parseWavMs(evilWav).isEmpty)
    // MP4 box size 0xFFFFFFF0 passes a Long `< 8` check but wraps negative
    // via toInt — must walk off the end, not index negative
    val evilMp4 = Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xF0.toByte) ++
      ascii("xxxx") ++ Array.fill[Byte](40)(0x78)
    assert(MediaCodec.parseMp4Ms(evilMp4).isEmpty)
  }

  test("WAV/MP4 parsers recover duration; garbage payloads never throw") {
    assert(MediaCodec.parseWavMs(MediaHeaders.wav(12345L)).contains(12345L))
    assert(MediaCodec.parseMp4Ms(MediaHeaders.mp4(30999L)).contains(30999L))
    val junk = Array.tabulate(300)(i => (i * 37).toByte)
    assert(MediaCodec.parseWavMs(junk).isEmpty)
    assert(MediaCodec.parseMp4Ms(junk).isEmpty)
    assert(MediaCodec.parseMp4Ms(MediaHeaders.mp4(5000L).take(30)).isEmpty)
    // a corrupt row must still decode (total function), flagged inconsistent
    val bad = Multimodal.MediaRow(9L, "image", junk, "image/png", 10, 10, 0L)
    val f = MediaCodec.decode(bad)
    assert(!f.meta_consistent && f.parsed_width == -1 && f.byte_len == 300)
  }

  test("frame sampling fans out one row per second of parsed duration, capped") {
    val media = Multimodal.syntheticMedia(spark, 100)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L, maxFrames = 8)
      .collect().groupBy(_.media_id)
    val videos = media.collect().filter(_.kind == "video").map(r => r.media_id -> r.duration_ms).toMap
    assert(frames.keySet == videos.keySet, "exactly the video rows emit frames")
    frames.foreach { case (id, fs) =>
      val expect = math.min(8L, videos(id) / 1000L + 1).toInt
      assert(fs.length == expect, s"media $id: ${fs.length} frames, want $expect")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until expect))
      assert(fs.forall(f => f.ts_ms == f.frame_idx * 1000L && f.frame_payload.nonEmpty))
      // the grab is real: every sampled frame is a complete, decodable PNG
      assert(fs.forall(f => graft.ops.PngCodec.decode(f.frame_payload).exists(
        img => img.width == 4 && img.height == 4)), s"media $id frames must decode")
    }
  }

  test("PNG codec round-trips pixels bit-exactly under every scanline filter") {
    import graft.ops.PngCodec
    val rnd = new scala.util.Random(7)
    val img = Multimodal.syntheticPixels(13, 9, rnd) // odd dims: exercise edge columns
    for (filter <- 0 to 4) {
      val back = PngCodec.decode(PngCodec.encode(img, filter))
      assert(back.isDefined, s"filter $filter must decode")
      assert(back.get.width == 13 && back.get.height == 9)
      assert(back.get.rgba.sameElements(img.rgba), s"filter $filter pixels must round-trip")
    }
  }

  test("PNG decode handles gray/RGB/gray-alpha color types and rejects garbage") {
    import graft.ops.PngCodec
    import java.util.zip.{CRC32, Deflater}
    // hand-build a minimal PNG of any color type with filter-0 rows
    def rawPng(w: Int, h: Int, colorType: Int, channels: Array[Byte]): Array[Byte] = {
      val ch = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
      val raw = (0 until h).flatMap(y =>
        0.toByte +: channels.slice(y * w * ch, (y + 1) * w * ch)).toArray
      val d = new Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      def chunk(t: String, data: Array[Byte]) = {
        val tb = t.getBytes("US-ASCII"); val c = new CRC32(); c.update(tb); c.update(data)
        be(data.length) ++ tb ++ data ++ be(c.getValue.toInt)
      }
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
        chunk("IHDR", be(w) ++ be(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)) ++
        chunk("IDAT", out.toByteArray) ++ chunk("IEND", Array.empty[Byte])
    }
    // gray 2x2: values become r=g=b, alpha 255
    val gray = PngCodec.decode(rawPng(2, 2, 0, Array[Byte](10, 20, 30, 40))).get
    assert(gray.rgba.toSeq == Seq[Byte](10, 10, 10, -1, 20, 20, 20, -1,
      30, 30, 30, -1, 40, 40, 40, -1))
    // RGB 1x2
    val rgb = PngCodec.decode(rawPng(1, 2, 2, Array[Byte](1, 2, 3, 4, 5, 6))).get
    assert(rgb.rgba.toSeq == Seq[Byte](1, 2, 3, -1, 4, 5, 6, -1))
    // gray+alpha 2x1
    val ga = PngCodec.decode(rawPng(2, 1, 4, Array[Byte](9, 100, 7, 50))).get
    assert(ga.rgba.toSeq == Seq[Byte](9, 9, 9, 100, 7, 7, 7, 50))
    // garbage / header-only / truncated-IDAT payloads decode to None, never throw
    assert(PngCodec.decode(Array.tabulate(300)(i => (i * 37).toByte)).isEmpty)
    assert(PngCodec.decode(Multimodal.MediaHeaders.png(8, 8)).isEmpty)
    val whole = rawPng(4, 4, 6, Array.tabulate(64)(_.toByte))
    assert(PngCodec.decode(whole.take(whole.length - 20)).isEmpty)
  }

  test("nearest-neighbor resample maps exact source pixels") {
    import graft.ops.PngCodec
    // 2x2 distinct-color image upscaled 2x: each source pixel becomes a 2x2 block
    val src = PngCodec.Image(2, 2, Array[Byte](
      1, 1, 1, -1, 2, 2, 2, -1,
      3, 3, 3, -1, 4, 4, 4, -1))
    val up = PngCodec.resizeNearest(src, 4, 4)
    val px = (0 until 16).map(i => up.rgba(i * 4))
    assert(px == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
    // downscale back recovers the corners-compatible originals
    val down = PngCodec.resizeNearest(up, 2, 2)
    assert(down.rgba.sameElements(src.rgba))
  }

  test("image resize re-samples real pixels, not just the header") {
    import graft.ops.PngCodec
    val media = Multimodal.syntheticMedia(spark, 60)
    val sources = media.collect().filter(_.mime == "image/png").map(r => r.media_id -> r.payload).toMap
    // pixel resampling is the PNG path; JPEG rows take the header-patch
    // fallback (pixel decode documented PNG-only) — asserted separately
    val resized = Multimodal.resizeImages(media, 16, 12).collect()
      .filter(_.mime == "image/png")
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val img = PngCodec.decode(r.payload)
      assert(img.isDefined, s"resized payload of ${r.media_id} must decode")
      assert(img.get.width == 16 && img.get.height == 12)
      // pixels are the nearest-neighbor resample of the ORIGINAL pixels
      val want = PngCodec.resizeNearest(PngCodec.decode(sources(r.media_id)).get, 16, 12)
      assert(img.get.rgba.sameElements(want.rgba), s"media ${r.media_id} must be truly resampled")
    }
  }

  test("undecodable image payloads keep the header-patch resize fallback") {
    import spark.implicits._
    // header-only PNG (no IDAT): the old total-on-garbage path
    val row = Multimodal.MediaRow(1L, "image",
      Multimodal.MediaHeaders.png(100, 80), "image/png", 100, 80, 0L)
    val out = Multimodal.resizeImages(
      spark.createDataset(Seq(row)), 32, 24).collect()(0)
    assert(Multimodal.MediaCodec.parsePng(out.payload).contains((32, 24)))
    assert(out.width == 32 && out.height == 24)
    assert(out.payload.length == row.payload.length, "fallback only patches the header")
  }

  test("brightness is true mean luminance for decodable pixels") {
    import spark.implicits._
    import graft.ops.PngCodec
    // uniform color (60, 120, 180): mean luminance = (60+120+180)/3/255
    val img = PngCodec.Image(4, 4, Array.tabulate(64)(i => i % 4 match {
      case 0 => 60.toByte; case 1 => 120.toByte; case 2 => 180.toByte; case _ => -1
    }))
    val row = Multimodal.MediaRow(5L, "image", PngCodec.encode(img), "image/png", 4, 4, 0L)
    val f = Multimodal.extractFeatures(spark.createDataset(Seq(row))).collect()(0)
    assert(math.abs(f.brightness - 120.0 / 255.0) < 1e-12)
  }

  test("image resize rewrites the container header; parsed dims follow") {
    val resized = Multimodal.resizeImages(
      Multimodal.syntheticMedia(spark, 100), 32, 24)
    val feats = Multimodal.extractFeatures(resized).collect()
    val images = feats.filter(_.kind == "image")
    assert(images.nonEmpty)
    // header rewrite is real: the parser recovers the TARGET dims, and the
    // declared metadata was updated in lockstep, so consistency holds
    assert(images.forall(f => f.parsed_width == 32 && f.parsed_height == 24),
      images.filterNot(f => f.parsed_width == 32).take(3).toSeq)
    assert(feats.forall(_.meta_consistent))
    // non-images pass through untouched
    assert(feats.filter(_.kind == "audio").forall(_.parsed_duration_ms >= 1000))
  }

  test("a custom codec drops into the same plumbing") {
    val custom = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(spark, 10),
      row => Multimodal.MediaCodec.decode(row).copy(brightness = 0.5))
    assert(custom.collect().forall(_.brightness == 0.5))
  }

  /** 44-byte PCM-16 mono WAV around explicit samples. */
  private def wavOf(samples: Array[Int], rate: Int = 8000): Array[Byte] = {
    def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    val data = samples.flatMap(s => Array(s.toByte, (s >> 8).toByte))
    ascii("RIFF") ++ le32(36L + data.length) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++
      Array[Byte](1, 0, 1, 0) ++ le32(rate) ++ le32(rate * 2L) ++
      Array[Byte](2, 0, 16, 0) ++
      ascii("data") ++ le32(data.length) ++ data
  }

  test("PCM decode: exact samples, peak, zero crossings, rms on a square wave") {
    // amplitude-1000 square wave, period 8: 100 half-periods of 4 samples
    val sq = Array.tabulate(400)(i => if ((i / 4) % 2 == 0) 1000 else -1000)
    val Some((rate, ch, got)) = Multimodal.parseWavPcm(wavOf(sq))
    assert(rate == 8000 && ch == 1 && got.toSeq == sq.toSeq)
    val f = Multimodal.pcmFeatures(7L, rate, ch, got)
    assert(f.peak_abs == 1000)
    assert(f.zero_crossings == 99) // one per half-period boundary
    assert(math.abs(f.rms - 1000.0 / 32768.0) < 1e-12) // constant |s| = exact rms
    // negative samples round-trip the little-endian sign extension
    val Some((_, _, neg)) = Multimodal.parseWavPcm(wavOf(Array(-32768, 32767, -1)))
    assert(neg.toSeq == Seq(-32768, 32767, -1))
    // a malformed fmt chunk DECLARING len < 16 must not parse the next
    // chunk's bytes as format fields — total-decoder returns None
    val good = wavOf(sq)
    val bad = good.clone()
    bad(16) = 4 // fmt chunk len 16 -> 4
    assert(Multimodal.parseWavPcm(bad).isEmpty,
      "fmt len < 16 must be undecodable, not misparsed")
  }

  test("audioFeatures over the synthetic corpus: every audio row decodes; corrupt flagged") {
    val media = Multimodal.syntheticMedia(spark, 120)
    val feats = Multimodal.audioFeatures(media).collect()
    val nAudio = media.collect().count(_.kind == "audio")
    assert(feats.length == nAudio && nAudio > 0)
    assert(feats.forall(f => f.n_samples >= 0 && f.sample_rate == 8000),
      "synthetic WAV payloads must PCM-decode")
    // corrupt payload surfaces flagged, not dropped and not thrown
    import spark.implicits._
    val bad = Seq(Multimodal.MediaRow(1L, "audio",
      Array.tabulate(100)(i => (i * 31).toByte), "audio/wav", 0, 0, 9L)).toDS()
    val bf = Multimodal.audioFeatures(bad).collect()
    assert(bf.length == 1 && bf.head.n_samples == -1L)
  }
}
