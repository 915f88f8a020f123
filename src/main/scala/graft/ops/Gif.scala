package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Dependency-free GIF89a codec — the palette+LZW container class the
  * other real decoders don't cover (BMP = raw truecolor, PNG =
  * filtered deflate, JPEG = lossy DCT baseline+progressive, WAV =
  * PCM audio). From-scratch encoder (so queries can plant synthetic
  * payloads with closed-form oracles) plus a general decoder behind
  * the same [[Multimodal.Decoder]] seam.
  *
  * Format notes (public spec, GIF89a + the LZW appendix):
  *   - header `GIF89a`, logical screen descriptor, 256-entry global
  *     color table, image descriptor, LZW-compressed 8-bit index
  *     stream in ≤255-byte sub-blocks, trailer;
  *   - GIF-LZW: initial code size 9 (min 8 + 1), CLEAR = 256,
  *     EOI = 257, codes packed LSB-FIRST (PNG/JPEG pack MSB-first —
  *     the classic cross-codec trap), dictionary capped at 12 bits;
  *   - THE OFF-BY-ONE the spec appendix warns about: the encoder
  *     widens the code size when its next-free code reaches 2^width
  *     (it is one entry AHEAD at emission time), while the decoder —
  *     whose table lags one entry behind — must widen when ITS
  *     next-free code reaches 2^width − 1. GifSpec's round-trip over
  *     dictionary-filling noise images would desync on the first
  *     boundary if either side drifted;
  *   - KwKwK (code == next-free): the entry is prev + prev.head —
  *     exercised deterministically by any constant-color run;
  *   - encoder emits CLEAR and resets when the table hits 4095,
  *     sidestepping the deferred-clear ambiguity some decoders
  *     mishandle.
  *
  * Scale: encode/decode are per-payload byte loops inside the executor
  * (mapPartitions batch), payloads never leave the scan stage —
  * identical altitude to Bmp/Png/Jpeg.
  */
object Gif {

  private final val MaxCode = 4095 // 12-bit dictionary cap

  // ---------------------------------------------------------- encoder

  private final class LsbBitWriter {
    val out = ArrayBuffer.empty[Byte]
    private var acc = 0
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code << nbits
      nbits += width
      while (nbits >= 8) {
        out += (acc & 0xff).toByte
        acc >>>= 8
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) { out += (acc & 0xff).toByte; acc = 0; nbits = 0 }
  }

  /** GIF-variant LZW over `minCode`-bit symbols (r15: generalized
    * from the hard-wired 8 — real-world GIFs with palettes under 256
    * colors use min code sizes 2–7): CLEAR = 2^minCode,
    * EOI = CLEAR + 1, initial code width = minCode + 1.
    */
  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bw = new LsbBitWriter
    var codeSize = minCode + 1
    var next = eoi + 1
    var dict = new java.util.HashMap[Long, Integer]()
    def key(prefix: Int, k: Int): Long = (prefix.toLong << 8) | k
    bw.put(clear, codeSize)
    var w = indices(0)
    var i = 1
    while (i < indices.length) {
      val k = indices(i)
      val e = dict.get(key(w, k))
      if (e != null) w = e.intValue()
      else {
        bw.put(w, codeSize)
        if (next == MaxCode) { // table full: clear and restart
          bw.put(clear, codeSize)
          codeSize = minCode + 1
          next = eoi + 1
          dict = new java.util.HashMap[Long, Integer]()
        } else {
          dict.put(key(w, k), Integer.valueOf(next))
          next += 1
          // encoder is one entry AHEAD of the decoder: widen when the
          // next-free code reaches the current limit
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        w = k
      }
      i += 1
    }
    bw.put(w, codeSize)
    // the decoder adds a dictionary entry after EVERY data code (it
    // lags one behind), including the last one — mirror that phantom
    // add so the EOI is written at the width the decoder will read it
    if (next < MaxCode) {
      next += 1
      if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
    }
    bw.put(eoi, codeSize)
    bw.flush()
    bw.out.toArray
  }

  /** Encode a width×height 8-bit-palette GIF89a. `palette(i)` gives
    * (r, g, b) for index i ∈ [0, 256); `index(x, y)` the pixel's
    * palette index (y = 0 is the TOP row).
    */
  def encode8(width: Int, height: Int, palette: Int => (Int, Int, Int),
      index: (Int, Int) => Int, minCodeSize: Int = 8): Array[Byte] =
    encodeFrames(width, height, palette, Seq(index), minCodeSize)

  /** One frame of [[encodeGif]]: the pixel-index function, an optional
    * LOCAL color table (overrides the global one for this frame —
    * r16: real multi-image GIFs carry per-image palettes), the
    * interlace flag (r16: rows stored in the 4-pass GIF order
    * 0,8,16,… / 4,12,… / 2,6,… / 1,3,…), an optional REGION
    * (ix, iy, iw, ih — partial-frame animation, the dominant real
    * animated-GIF layout: only the changed rectangle is stored),
    * the GCE disposal method (0/1 leave, 2 restore-to-background,
    * 3 restore-to-previous), and an optional transparent index
    * (pixels with that index leave the canvas untouched). `index` is
    * evaluated in REGION-LOCAL coordinates.
    */
  final case class Frame(index: (Int, Int) => Int,
      localPalette: Option[Int => (Int, Int, Int)] = None,
      interlaced: Boolean = false,
      region: Option[(Int, Int, Int, Int)] = None,
      disposal: Int = 0,
      transparent: Option[Int] = None)

  /** The GIF-interlace row schedule for `h` rows: stream position →
    * display row (spec appendix: passes start 0/4/2/1, steps 8/8/4/2).
    */
  private[graft] def interlaceOrder(h: Int): Array[Int] = {
    val order = new ArrayBuffer[Int](h)
    Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
      var r = start
      while (r < h) { order += r; r += step }
    }
    order.toArray
  }

  /** Encode an (optionally animated) GIF89a: one full-frame image
    * descriptor per entry of `frames`, each preceded by a Graphic
    * Control Extension (as real animation encoders emit — also
    * exercising the decoder's between-frame extension skip).
    * `minCodeSize` ∈ [2, 8] is the LZW minimum code size (r15: real
    * GIFs with palettes under 256 colors use 2–7); every palette
    * index must be < 2^minCodeSize.
    */
  def encodeFrames(width: Int, height: Int,
      palette: Int => (Int, Int, Int),
      frames: Seq[(Int, Int) => Int],
      minCodeSize: Int = 8): Array[Byte] =
    encodeGif(width, height, Some(palette), frames.map(Frame(_)),
      minCodeSize)

  /** The general encoder behind [[encodeFrames]]: optional global
    * color table, per-frame local tables and interlacing. At least one
    * of `globalPalette` / the frame's `localPalette` must cover each
    * frame (the decoder is loud otherwise — same as real files).
    */
  def encodeGif(width: Int, height: Int,
      globalPalette: Option[Int => (Int, Int, Int)],
      frames: Seq[Frame],
      minCodeSize: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty)
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"gif: LZW minimum code size out of range: $minCodeSize")
    val out = ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes("US-ASCII")
    def u16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
    def writeTable(palette: Int => (Int, Int, Int)): Unit = {
      var i = 0
      while (i < 256) {
        val (r, g, b) = palette(i)
        out += r.toByte; out += g.toByte; out += b.toByte
        i += 1
      }
    }
    u16(width); u16(height)
    // packed: GCT flag, 8-bit color resolution, 256 entries
    out += (if (globalPalette.isDefined) 0xf7 else 0x77).toByte
    out += 0x00.toByte // background color index
    out += 0x00.toByte // pixel aspect ratio
    globalPalette.foreach(writeTable)
    frames.foreach { frame =>
      val (ix, iy, iw, ih) = frame.region.getOrElse((0, 0, width, height))
      require(ix >= 0 && iy >= 0 && iw > 0 && ih > 0 &&
        ix + iw <= width && iy + ih <= height,
        s"gif: frame region ($ix,$iy ${iw}x$ih) outside ${width}x$height")
      require(frame.disposal >= 0 && frame.disposal <= 3,
        s"gif: disposal method ${frame.disposal}")
      // graphic control extension: disposal + optional transparency
      out += 0x21.toByte; out += 0xf9.toByte; out += 0x04.toByte
      out += ((frame.disposal << 2) |
        (if (frame.transparent.isDefined) 1 else 0)).toByte
      u16(10) // delay 10 cs
      out += frame.transparent.getOrElse(0).toByte
      out += 0x00.toByte
      out += 0x2c.toByte // image descriptor
      u16(ix); u16(iy); u16(iw); u16(ih)
      val lctFlag = if (frame.localPalette.isDefined) 0x87 else 0x00 // 256-entry LCT
      val intFlag = if (frame.interlaced) 0x40 else 0x00
      out += (lctFlag | intFlag).toByte
      frame.localPalette.foreach(writeTable)
      out += minCodeSize.toByte // LZW minimum code size
      val indices = new Array[Int](iw * ih)
      val order =
        if (frame.interlaced) interlaceOrder(ih)
        else Array.tabulate(ih)(identity)
      var s = 0
      while (s < ih) {
        val y = order(s) // stream row s carries region-local row y
        var x = 0
        while (x < iw) {
          val v = frame.index(x, y)
          require(v >= 0 && v < (1 << minCodeSize),
            s"palette index out of range for min code $minCodeSize: $v")
          indices(s * iw + x) = v
          x += 1
        }
        s += 1
      }
      val lzw = lzwEncode(indices, minCodeSize)
      var off = 0
      while (off < lzw.length) { // ≤255-byte sub-blocks
        val n = math.min(255, lzw.length - off)
        out += n.toByte
        out ++= java.util.Arrays.copyOfRange(lzw, off, off + n)
        off += n
      }
      out += 0x00.toByte // block terminator
    }
    out += 0x3b.toByte // trailer
    out.toArray
  }

  // ---------------------------------------------------------- decoder

  private final class LsbBitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0
    private var nbits = 0
    def read(width: Int): Int = {
      while (nbits < width) {
        require(pos < data.length, "gif: truncated LZW stream")
        acc |= (data(pos) & 0xff) << nbits
        pos += 1
        nbits += 8
      }
      val v = acc & ((1 << width) - 1)
      acc >>>= width
      nbits -= width
      v
    }
  }

  private def lzwDecode(data: Array[Byte], expected: Int,
      minCode: Int): Array[Int] = {
    require(minCode >= 2 && minCode <= 8,
      s"gif: LZW minimum code size out of range: $minCode")
    val clear = 1 << minCode
    val eoi = clear + 1
    val br = new LsbBitReader(data)
    val out = new Array[Int](expected)
    var n = 0
    // dictionary as prefix/suffix chains; entries 0..clear-1 are literals
    val prefix = new Array[Int](MaxCode + 1)
    val suffix = new Array[Int](MaxCode + 1)
    val stack = new Array[Int](MaxCode + 2)
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    def headOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    /** Write string(code), then `extra` if ≥ 0 (the KwKwK tail);
      * returns the string's head symbol.
      */
    def emit(code: Int, extra: Int): Int = {
      var c = code
      var sp = 0
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val total = 1 + sp + (if (extra >= 0) 1 else 0)
      require(n + total <= expected, "gif: more pixels than declared")
      out(n) = c; n += 1
      while (sp > 0) { sp -= 1; out(n) = stack(sp); n += 1 }
      if (extra >= 0) { out(n) = extra; n += 1 }
      c
    }
    var done = false
    while (!done) {
      val code = br.read(codeSize)
      if (code == clear) {
        codeSize = minCode + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, "gif: first code after clear must be a literal")
        emit(code, -1)
        prev = code
      } else {
        require(code <= next, s"gif: code $code beyond dictionary ($next)")
        val head =
          if (code < next) emit(code, -1)
          else emit(prev, headOf(prev)) // KwKwK: string(prev) + head(prev)
        if (next <= MaxCode) {
          prefix(next) = prev
          suffix(next) = head
          next += 1
          // decoder table lags the encoder by one entry, so it widens
          // ONE EARLY — at 2^width − 1, not 2^width (spec appendix)
          if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(n == expected, s"gif: decoded $n pixels, expected $expected")
    out
  }

  /** Decoded image: top-down RGB24 rows (the Bmp/Png/Jpeg contract). */
  final case class Decoded(width: Int, height: Int, rows: Vector[Array[Byte]])

  /** Single-image decode. LOUD on animations (r15, ADVICE r14): a
    * multi-frame file through a single-image API would silently drop
    * every frame after the first — callers that expect animations use
    * [[decodeFrames]].
    */
  def decode(bytes: Array[Byte]): Decoded = {
    val fs = decodeFrames(bytes)
    require(fs.length == 1,
      s"gif: ${fs.length} frames — use decodeFrames for animated GIFs")
    fs.head
  }

  /** Decode EVERY image descriptor up to the trailer (r15: animated
    * GIFs; r16: full COMPOSITING). Each emitted frame is a logical-
    * screen-sized SNAPSHOT of the compositing canvas after that image
    * draws — partial-frame regions, disposal methods 0-3 (leave /
    * restore-to-background / restore-to-previous) and transparent
    * indexes all honored, which is the dominant real animated-GIF
    * layout (only the changed rectangle is stored per frame). For
    * full-screen opaque frames this degenerates to exactly the r15
    * per-image decode.
    */
  def decodeFrames(bytes: Array[Byte]): Vector[Decoded] =
    try decodeImpl(bytes)
    catch { // a truncated stream fails mid-walk: surface it as the
      // same loud IllegalArgumentException the other codecs throw
      case e: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("gif: truncated stream", e)
    }

  private def decodeImpl(bytes: Array[Byte]): Vector[Decoded] = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII").matches("GIF8[79]a"),
      "gif: missing GIF87a/GIF89a header")
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    var pos = 6
    val sw = u16(pos); val sh = u16(pos + 2)
    val packed = bytes(pos + 4) & 0xff
    val bgIdx = bytes(pos + 5) & 0xff
    pos += 7
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val sz = 3 * (2 << (packed & 7))
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + sz)
      pos += sz
    }
    // the compositing canvas (r16 — partial-frame animation): each
    // image descriptor draws its region onto the canvas; each emitted
    // frame is a SNAPSHOT of the canvas after the draw (what a viewer
    // shows). Initialized to the background color (GCT[bgIdx], black
    // without a GCT — deterministic; real viewers differ on bg vs
    // transparent, and a closed-form oracle needs ONE answer).
    val bg: Array[Byte] =
      if (gct != null && bgIdx * 3 + 2 < gct.length)
        Array(gct(bgIdx * 3), gct(bgIdx * 3 + 1), gct(bgIdx * 3 + 2))
      else Array[Byte](0, 0, 0)
    lazy val canvas: Array[Array[Byte]] = Array.fill(sh) {
      val row = new Array[Byte](sw * 3)
      var x = 0
      while (x < sw) {
        row(x * 3) = bg(0); row(x * 3 + 1) = bg(1); row(x * 3 + 2) = bg(2)
        x += 1
      }
      row
    }
    // graphic-control state for the NEXT image descriptor
    var disposal = 0
    var transparent = -1
    val frames = Vector.newBuilder[Decoded]
    var done = false
    while (!done) {
      // extensions: PARSE the graphic control one (disposal +
      // transparency feed compositing), skip the rest (comment,
      // application, …)
      while ((bytes(pos) & 0xff) == 0x21) {
        val label = bytes(pos + 1) & 0xff
        if (label == 0xf9 && (bytes(pos + 2) & 0xff) == 4) {
          val gp = bytes(pos + 3) & 0xff
          disposal = (gp >> 2) & 7
          transparent = if ((gp & 1) != 0) bytes(pos + 6) & 0xff else -1
        }
        pos += 2 // extension introducer + label
        while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
        pos += 1
      }
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true // trailer
        case 0x2c =>
          val ix = u16(pos + 1); val iy = u16(pos + 3)
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          require(ix + iw <= sw && iy + ih <= sh && iw > 0 && ih > 0,
            s"gif: image region ($ix,$iy ${iw}x$ih) outside ${sw}x$sh")
          val interlaced = (ipacked & 0x40) != 0 // r16: de-interlaced below
          pos += 10
          var ct = gct
          if ((ipacked & 0x80) != 0) { // local color table wins
            val sz = 3 * (2 << (ipacked & 7))
            ct = java.util.Arrays.copyOfRange(bytes, pos, pos + sz)
            pos += sz
          }
          require(ct != null, "gif: no color table")
          val minCode = bytes(pos) & 0xff
          pos += 1
          val lzw = ArrayBuffer.empty[Byte]
          var blockLen = bytes(pos) & 0xff
          while (blockLen != 0) {
            pos += 1
            lzw ++= java.util.Arrays.copyOfRange(bytes, pos, pos + blockLen)
            pos += blockLen
            blockLen = bytes(pos) & 0xff
          }
          pos += 1 // block terminator
          val indices = lzwDecode(lzw.toArray, iw * ih, minCode)
          // interlaced streams store rows in 4-pass order; map each
          // STREAM row back to its DISPLAY row (r16)
          val order =
            if (interlaced) interlaceOrder(ih)
            else Array.tabulate(ih)(identity)
          // disposal 3 (restore-to-previous): save the region's
          // pre-draw pixels — region-sized, not canvas-sized
          val saved: Array[Array[Byte]] =
            if (disposal == 3)
              Array.tabulate(ih)(r => java.util.Arrays.copyOfRange(
                canvas(iy + r), ix * 3, (ix + iw) * 3))
            else null
          var s = 0
          while (s < ih) {
            val y = iy + order(s)
            val row = canvas(y)
            var x = 0
            while (x < iw) {
              val idx = indices(s * iw + x)
              if (idx != transparent) { // transparent pixels leave canvas
                require(idx * 3 + 2 < ct.length,
                  s"gif: palette index $idx out of table")
                val o = (ix + x) * 3
                row(o) = ct(idx * 3)
                row(o + 1) = ct(idx * 3 + 1)
                row(o + 2) = ct(idx * 3 + 2)
              }
              x += 1
            }
            s += 1
          }
          // emitted frame = canvas snapshot after the draw
          frames += Decoded(sw, sh, canvas.map(_.clone()).toVector)
          // dispose for the NEXT frame
          disposal match {
            case 2 => // restore the region to the background color
              var r = 0
              while (r < ih) {
                val row = canvas(iy + r)
                var x = 0
                while (x < iw) {
                  val o = (ix + x) * 3
                  row(o) = bg(0); row(o + 1) = bg(1); row(o + 2) = bg(2)
                  x += 1
                }
                r += 1
              }
            case 3 => // restore the region to its pre-draw pixels
              var r = 0
              while (r < ih) {
                System.arraycopy(saved(r), 0, canvas(iy + r), ix * 3, iw * 3)
                r += 1
              }
            case _ => // 0/1: leave in place
          }
          disposal = 0
          transparent = -1
        case other => throw new IllegalArgumentException(
          f"gif: unexpected block 0x$other%02x at offset $pos")
      }
    }
    val out = frames.result()
    require(out.nonEmpty, "gif: no image descriptor before trailer")
    out
  }

  /** [[Multimodal.Decoder]] over GIF payloads (the Bmp/Png/Jpeg
    * RowDecoder contract: top-down RGB24 rows).
    */
  final case class RowDecoder() extends Multimodal.Decoder {
    def frameStride: Int = 0
    def frameLen: Int = 0
    def sampleFrames(payload: Array[Byte]): Vector[Array[Byte]] =
      decode(payload).rows
  }
}
