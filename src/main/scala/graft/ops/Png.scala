package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free 8-bit-RGB PNG writer + parser — the third real
  * public container behind the [[Multimodal.Decoder]] seam (BMP
  * proved the uncompressed image path, WAV the audio path; PNG covers
  * the lossless-COMPRESSED image corner — its pixel stream is a zlib
  * deflate stream, the same FlateDecode machinery
  * [[graft.sources.PdfPages]] already uses for PDF content streams).
  *
  * Format notes (public spec, RFC 2083): 8-byte signature; then
  * length-type-data-CRC chunks, big-endian lengths, CRC32 over
  * type+data. IHDR carries geometry (width, height, bit depth, color
  * type 2 = truecolor RGB, compression 0, filter method 0, interlace
  * 0). The pixel stream is the zlib-deflate of the scanlines, each
  * prefixed by ONE filter-type byte; rows are stored TOP-DOWN (unlike
  * BMP) in RGB order, split across any number of IDAT chunks.
  *
  * The writer emits filter type 0 (None) rows in a single IDAT with a
  * STORED-block zlib stream (level 0) — a legal PNG whose byte length
  * is a closed form of the geometry (scanline bytes n = h·(1+3·w) →
  * zlib length n + 11 for n ≤ 65535-byte blocks), which is what lets
  * planted-twin oracles reason about payload sizes exactly. The
  * parser is deliberately MORE general than the writer (the Bmp
  * data-offset discipline): any zlib compression level, IDAT split at
  * any boundary, foreign ancillary chunks skipped, ALL FIVE scanline
  * filters (None/Sub/Up/Average/Paeth — r16 completed the set libpng's
  * adaptive filtering actually emits) reversed, and Adam7 interlacing
  * de-scattered. CRCs are verified on every chunk.
  *
  * Scale: encode/decode are per-row executor byte loops inside a
  * mapPartitions batch; payloads never leave the scan stage —
  * identical altitude to the Bmp/Wav decoders.
  */
object Png {

  val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def chunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val t = chunkType.getBytes("US-ASCII")
    require(t.length == 4)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Closed-form encoded length of [[encodeRgb8]]'s output for w×h
    * (valid while the scanline stream fits one stored zlib block,
    * h·(1+3·w) ≤ 65535): signature 8 + IHDR 25 + IDAT (12 + n + 11)
    * + IEND 12.
    */
  def encodedLen(width: Int, height: Int): Int = {
    val n = height * (1 + 3 * width)
    require(n <= 65535, "multi-block stored stream: length not closed-form")
    8 + 25 + (12 + n + 11) + 12
  }

  /** Encode a width×height truecolor PNG; `rgb(x, y)` returns the pixel
    * at column x, row y (y = 0 is the TOP row), each channel 0-255.
    * Filter 0 rows, one IDAT, stored-block zlib (level 0) so the
    * output length is [[encodedLen]] exactly.
    */
  def encodeRgb8(width: Int, height: Int,
                 rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val raw = new Array[Byte](height * (1 + 3 * width))
    var i = 0
    var y = 0
    while (y < height) {
      raw(i) = 0 // filter type None
      i += 1
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        raw(i) = r.toByte; raw(i + 1) = g.toByte; raw(i + 2) = b.toByte
        i += 3
        x += 1
      }
      y += 1
    }
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, color 2 (RGB), deflate, filter 0, no interlace
    val idat = deflateStored(raw)
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Adam7 pass geometry (PNG spec §8.2): (xstart, ystart, xstep,
    * ystep) per pass. Each pass is an independently-filtered
    * sub-image; empty passes (zero pixels for small geometries) emit
    * no scanlines at all.
    */
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def passDims(width: Int, height: Int,
      p: (Int, Int, Int, Int)): (Int, Int) = {
    val (xs, ys, xstep, ystep) = p
    (math.max(0, (width - xs + xstep - 1) / xstep),
      math.max(0, (height - ys + ystep - 1) / ystep))
  }

  /** Encode a width×height truecolor PNG with Adam7 interlacing (r16:
    * the progressive-render layout real web PNGs ship): the raw
    * stream is the concatenation of the 7 passes' scanlines, each
    * pass filtered independently (filter 0 rows here), IHDR interlace
    * byte 1. Same stored-zlib determinism as [[encodeRgb8]].
    */
  def encodeRgb8Adam7(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val raw = new java.io.ByteArrayOutputStream()
    Adam7.foreach { p =>
      val (xs, ys, xstep, ystep) = p
      val (pw, ph) = passDims(width, height, p)
      if (pw > 0 && ph > 0) {
        var ry = 0
        while (ry < ph) {
          raw.write(0) // filter type None
          val y = ys + ry * ystep
          var rx = 0
          while (rx < pw) {
            val (r, g, b) = rgb(xs + rx * xstep, y)
            raw.write(r); raw.write(g); raw.write(b)
            rx += 1
          }
          ry += 1
        }
      }
    }
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 1) // depth 8, color 2 (RGB), Adam7
    val idat = deflateStored(raw.toByteArray)
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** zlib stream with STORED blocks only (Deflater level 0):
    * deterministic, closed-form length n + 11 per ≤ 65535-byte input.
    */
  private def deflateStored(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.NO_COMPRESSION)
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  final case class Parsed(width: Int, height: Int,
                          rows: Vector[Array[Byte]])

  /** Parse an 8-bit truecolor PNG: signature + chunk walk with CRC
    * verification, IDAT concatenation, zlib inflate, and scanline
    * de-filtering (all five types: None/Sub/Up/Average/Paeth). Rows come back
    * TOP-DOWN in RGB order — the [[Bmp.decode24]] contract, so the
    * same readout consumes both decoders.
    */
  def decodeRgb8(bytes: Array[Byte]): Parsed = {
    require(bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "bad PNG signature")
    var off = 8
    var width = 0
    var height = 0
    var interlaced = false
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off.toLong + 8 <= bytes.length, "truncated chunk header")
      val len = readBe32(bytes, off)
      require(len >= 0 && off.toLong + 12 + len <= bytes.length, "truncated chunk")
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len.toInt)
      require(crc.getValue == readBe32(bytes, off + 8 + len.toInt),
        s"CRC mismatch in $ctype chunk")
      ctype match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          width = readBe32(bytes, off + 8).toInt
          height = readBe32(bytes, off + 12).toInt
          val depth = bytes(off + 16) & 0xff
          val color = bytes(off + 17) & 0xff
          val comp = bytes(off + 18) & 0xff
          val filt = bytes(off + 19) & 0xff
          val inter = bytes(off + 20) & 0xff
          require(depth == 8 && color == 2,
            s"unsupported PNG depth/color $depth/$color (8-bit RGB only)")
          require(comp == 0 && filt == 0,
            "unsupported compression/filter method")
          require(inter == 0 || inter == 1,
            s"unknown interlace method $inter (none/Adam7 only)")
          interlaced = inter == 1
          require(width > 0 && height > 0, "bad geometry")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(bytes, off + 8, len.toInt)
        case "IEND" =>
          done = true
        case _ => // ancillary chunk (tEXt, gAMA, ...): skip
      }
      off += 12 + len.toInt
    }
    require(sawIhdr, "missing IHDR")
    // expected length in Long first (the Wav.scala chunk-bounds rule,
    // ADVICE r10/r11): an adversarial IHDR width ~2^30 overflows Int
    // stride math into a wrong small positive — or negative — expected
    // size before any allocation check
    val expectedL =
      if (!interlaced) height.toLong * (1L + 3L * width)
      else Adam7.map { p =>
        val (pw, ph) = passDims(width, height, p)
        if (pw > 0 && ph > 0) ph.toLong * (1L + 3L * pw) else 0L
      }.sum
    require(expectedL <= Int.MaxValue,
      s"implausible geometry ${width}x$height: pixel stream $expectedL bytes")
    val expected = expectedL.toInt
    val raw = inflate(idat.toByteArray, expected)
    require(raw.length == expected,
      s"pixel stream length ${raw.length} != expected $expected")
    /** De-filter `count` scanlines of `stride` bytes starting at
      * `base`; `prev` resets per call (each Adam7 pass filters
      * independently, exactly like the single pass of a plain PNG).
      */
    def defilter(base: Int, count: Int, stride: Int): Array[Array[Byte]] = {
      val out = new Array[Array[Byte]](count)
      var prev: Array[Byte] = null
      var y = 0
      while (y < count) {
        val b = base + y * (1 + stride)
        val ft = raw(b) & 0xff
        val row = new Array[Byte](stride)
        System.arraycopy(raw, b + 1, row, 0, stride)
        // left / up / upper-left RECONSTRUCTED bytes (0 past the
        // edge) — the PNG filter neighborhood a/b/c, bpp = 3
        def left(i: Int): Int = if (i >= 3) row(i - 3) & 0xff else 0
        def up(i: Int): Int = if (prev != null) prev(i) & 0xff else 0
        def ul(i: Int): Int =
          if (prev != null && i >= 3) prev(i - 3) & 0xff else 0
        ft match {
          case 0 => // None
          case 1 => // Sub: add the pixel 3 bytes to the left
            var i = 3
            while (i < stride) { row(i) = (row(i) + row(i - 3)).toByte; i += 1 }
          case 2 => // Up: add the byte directly above
            if (prev != null) {
              var i = 0
              while (i < stride) { row(i) = (row(i) + prev(i)).toByte; i += 1 }
            }
          case 3 => // Average: + floor((left + up) / 2)  (r16)
            var i = 0
            while (i < stride) {
              row(i) = (row(i) + ((left(i) + up(i)) >> 1)).toByte; i += 1
            }
          case 4 => // Paeth: + PaethPredictor(left, up, upper-left) (r16)
            var i = 0
            while (i < stride) {
              val pa = left(i); val pb = up(i); val pc = ul(i)
              val p = pa + pb - pc
              val da = math.abs(p - pa); val db = math.abs(p - pb)
              val dc = math.abs(p - pc)
              // spec tie-break order: a, then b, then c
              val pred = if (da <= db && da <= dc) pa
                else if (db <= dc) pb else pc
              row(i) = (row(i) + pred).toByte
              i += 1
            }
          case other =>
            throw new IllegalArgumentException(
              s"bad scanline filter $other (PNG defines 0-4)")
        }
        out(y) = row
        prev = row
        y += 1
      }
      out
    }
    if (!interlaced) {
      Parsed(width, height, defilter(0, height, 3 * width).toVector)
    } else {
      // Adam7 (r16): de-filter each pass independently, then scatter
      // its pixels to their full-image positions
      val full = Array.fill(height)(new Array[Byte](3 * width))
      var base = 0
      Adam7.foreach { p =>
        val (xs, ys, xstep, ystep) = p
        val (pw, ph) = passDims(width, height, p)
        if (pw > 0 && ph > 0) {
          val rows = defilter(base, ph, 3 * pw)
          base += ph * (1 + 3 * pw)
          var ry = 0
          while (ry < ph) {
            val src = rows(ry)
            val dst = full(ys + ry * ystep)
            var rx = 0
            while (rx < pw) {
              val x = xs + rx * xstep
              dst(x * 3) = src(rx * 3)
              dst(x * 3 + 1) = src(rx * 3 + 1)
              dst(x * 3 + 2) = src(rx * 3 + 2)
              rx += 1
            }
            ry += 1
          }
        }
      }
      Parsed(width, height, full.toVector)
    }
  }

  private def inflate(data: Array[Byte], sizeHint: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, sizeHint))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) {
        inf.end()
        throw new IllegalArgumentException("truncated zlib stream")
      }
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** [[Multimodal.Decoder]] adapter: frames = TOP-DOWN pixel rows in
    * RGB byte order (the [[Bmp.RowDecoder]] contract — both real image
    * decoders feed the same [[Multimodal.decodeRgbReadout]]).
    */
  final case class RowDecoder() extends Multimodal.Decoder {
    def frameStride: Int = 0
    def frameLen: Int = 0
    def sampleFrames(payload: Array[Byte]): Vector[Array[Byte]] =
      decodeRgb8(payload).rows
  }
}
