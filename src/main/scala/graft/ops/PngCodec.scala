package graft.ops

import java.util.zip.{CRC32, Deflater, DataFormatException, Inflater}

/** Pure-JVM PNG pixel codec (no libraries): real IDAT inflate + scanline
  * unfiltering on decode, real filtering + deflate + CRC32 chunks on
  * encode, per the public spec (ISO/IEC 15948: IHDR §11.2.2, filters
  * §9/§13.9). This de-stubs the pixel half of [[Multimodal]]: the header
  * codec was already real, now the bytes between IDAT and IEND are too.
  *
  * Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  * 6 (RGBA), non-interlaced — the shapes a training-data pipeline
  * normalizes to anyway. Anything else (16-bit, palette, Adam7) decodes
  * to None; like the header parsers, decode is TOTAL on garbage — a
  * 100 TB corpus will contain truncated and corrupt payloads, and they
  * must flow to the fallback path, never throw.
  */
object PngCodec {

  /** Decoded pixels, always normalized to RGBA8888 row-major. */
  final case class Image(width: Int, height: Int, rgba: Array[Byte]) {
    require(rgba.length == width * height * 4, "rgba must be w*h*4 bytes")
  }

  private val Sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** All offsets of the 8-byte PNG signature in `b` — the container walk
    * [[Multimodal.sampleFrames]] uses to locate embedded frame images.
    */
  def signatureOffsets(b: Array[Byte]): IndexedSeq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i + Sig.length <= b.length) {
      var j = 0
      while (j < Sig.length && b(i + j) == Sig(j)) j += 1
      if (j == Sig.length) out += i
      i += 1
    }
    out.toIndexedSeq
  }

  /** Decode a PNG payload to RGBA pixels; None on anything outside the
    * supported shape or on corrupt/truncated data. Trailing bytes after
    * IEND are ignored (payloads may embed multiple images back-to-back).
    */
  def decode(png: Array[Byte]): Option[Image] = try {
    if (png.length < 45 || !png.take(8).sameElements(Sig)) return None
    var off = 8
    var w = 0; var h = 0; var colorType = -1
    var ok = true
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && ok && off + 8 <= png.length) {
      val len = beInt(png, off)
      val typ = new String(png, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (len < 0 || off + 12L + len > png.length) ok = false
      else {
        typ match {
          case "IHDR" =>
            if (len != 13) ok = false
            else {
              w = beInt(png, off + 8); h = beInt(png, off + 12)
              val depth = png(off + 16) & 0xFF
              colorType = png(off + 17) & 0xFF
              val interlace = png(off + 20) & 0xFF
              ok = w > 0 && h > 0 && depth == 8 && interlace == 0 &&
                (colorType == 0 || colorType == 2 || colorType == 4 || colorType == 6) &&
                w.toLong * h * 4 <= Int.MaxValue
            }
          case "IDAT" => idat.write(png, off + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        off += 12 + len
      }
    }
    if (!ok || colorType < 0 || idat.size() == 0) return None
    val ch = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
    val rowBytes = w * ch
    val raw = new Array[Byte]((1 + rowBytes) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    // finally, not success-path end(): inflate throws DataFormatException
    // on exactly the corrupt payloads this codec must tolerate, and each
    // un-ended Inflater pins a native zlib buffer until finalization —
    // off-heap creep in long-lived executors scanning corrupt-heavy data
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 without progress means the stream can never complete:
        // needsInput = truncated, needsDictionary = zlib FDICT set (PNG
        // forbids it, adversarial bytes can still carry it) — either way
        // bail instead of spinning; totality on garbage is the contract
        if (n == 0) return None
        got += n
      }
    } finally inf.end()
    if (got < raw.length) return None

    // reverse the per-scanline filter in place (spec §9): a = left,
    // b = above, c = above-left, all zero outside the image
    val px = new Array[Byte](rowBytes * h) // channel bytes, filter bytes stripped
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + rowBytes)) & 0xFF
      if (f > 4) return None
      val src = y * (1 + rowBytes) + 1
      val dst = y * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = raw(src + i) & 0xFF
        val a = if (i >= ch) px(dst + i - ch) & 0xFF else 0
        val b = if (y > 0) px(dst - rowBytes + i) & 0xFF else 0
        val c = if (y > 0 && i >= ch) px(dst - rowBytes + i - ch) & 0xFF else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
        }
        px(dst + i) = v.toByte
        i += 1
      }
      y += 1
    }

    // normalize to RGBA
    val rgba = new Array[Byte](w * h * 4)
    var p = 0
    var q = 0
    val n = w * h
    var k = 0
    while (k < n) {
      colorType match {
        case 0 =>
          val v = px(p); rgba(q) = v; rgba(q + 1) = v; rgba(q + 2) = v
          rgba(q + 3) = 0xFF.toByte; p += 1
        case 2 =>
          rgba(q) = px(p); rgba(q + 1) = px(p + 1); rgba(q + 2) = px(p + 2)
          rgba(q + 3) = 0xFF.toByte; p += 3
        case 4 =>
          val v = px(p); rgba(q) = v; rgba(q + 1) = v; rgba(q + 2) = v
          rgba(q + 3) = px(p + 1); p += 2
        case _ =>
          rgba(q) = px(p); rgba(q + 1) = px(p + 1); rgba(q + 2) = px(p + 2)
          rgba(q + 3) = px(p + 3); p += 4
      }
      q += 4
      k += 1
    }
    Some(Image(w, h, rgba))
  } catch {
    case _: DataFormatException => None
    case _: ArrayIndexOutOfBoundsException => None
    case _: NegativeArraySizeException => None
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode RGBA pixels as an 8-bit color-type-6 PNG. `filterType`
    * selects the per-scanline filter (0–4); every filter is the exact
    * inverse of decode's unfilter, so encode→decode round-trips
    * bit-identically for any choice — tests sweep all five.
    */
  def encode(img: Image, filterType: Int = 0): Array[Byte] = {
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    val w = img.width; val h = img.height
    val rowBytes = w * 4
    val raw = new Array[Byte]((1 + rowBytes) * h)
    var y = 0
    while (y < h) {
      raw(y * (1 + rowBytes)) = filterType.toByte
      val dst = y * (1 + rowBytes) + 1
      val src = y * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = img.rgba(src + i) & 0xFF
        val a = if (i >= 4) img.rgba(src + i - 4) & 0xFF else 0
        val b = if (y > 0) img.rgba(src - rowBytes + i) & 0xFF else 0
        val c = if (y > 0 && i >= 4) img.rgba(src - rowBytes + i - 4) & 0xFF else 0
        val v = filterType match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(dst + i) = v.toByte
        i += 1
      }
      y += 1
    }
    val deflated = {
      val d = new Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      be(data.length) ++ t ++ data ++ be(crc.getValue.toInt)
    }
    val ihdr = be(w) ++ be(h) ++ Array[Byte](8, 6, 0, 0, 0)
    Sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Nearest-neighbor resample: source index = floor(dst * src / target),
    * the standard box-corner mapping — deterministic integer arithmetic,
    * no float rounding to disagree about.
    */
  def resizeNearest(img: Image, targetW: Int, targetH: Int): Image = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val out = new Array[Byte](targetW * targetH * 4)
    var y = 0
    while (y < targetH) {
      val sy = (y.toLong * img.height / targetH).toInt
      var x = 0
      while (x < targetW) {
        val sx = (x.toLong * img.width / targetW).toInt
        val s = (sy * img.width + sx) * 4
        val d = (y * targetW + x) * 4
        out(d) = img.rgba(s); out(d + 1) = img.rgba(s + 1)
        out(d + 2) = img.rgba(s + 2); out(d + 3) = img.rgba(s + 3)
        x += 1
      }
      y += 1
    }
    Image(targetW, targetH, out)
  }

  /** Mean luminance of the RGB channels in [0, 1] — the real-pixel
    * brightness [[Multimodal.MediaCodec]] reports when decode succeeds.
    */
  def meanBrightness(img: Image): Double = {
    val n = img.width * img.height
    if (n == 0) return 0.0
    var sum = 0L
    var k = 0
    while (k < n) {
      val p = k * 4
      sum += (img.rgba(p) & 0xFF) + (img.rgba(p + 1) & 0xFF) + (img.rgba(p + 2) & 0xFF)
      k += 1
    }
    sum.toDouble / (3.0 * n * 255.0)
  }
}
