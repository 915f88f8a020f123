package graft

import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Png

/** PNG writer/parser invariants (q_png_decode). Golden-bytes
  * discipline (BmpSpec/WavSpec): the declared query only proves the
  * round trip, so the fixture bytes here are hand-assembled straight
  * from the public spec (RFC 2083) — signature, chunk layout, stored-
  * block zlib framing and adler32 all written out by hand; only the
  * two chunk CRC32s come from the JDK's own CRC32 (independent of the
  * code under test). The compressed/filtered/split fixtures are built
  * with the raw JDK Deflater, NOT the repo encoder, so the decoder is
  * pinned to the format, not to our writer's choices.
  */
class PngSpec extends AnyFunSuite {

  // test-local chunk builder: JDK CRC32 over type+data (spec layout)
  private def chunk(t: String, data: Array[Byte]): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val tb = t.getBytes("US-ASCII")
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    be32(data.length) ++ tb ++ data ++ be32(crc.getValue.toInt)
  }

  private def deflate(raw: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private val ihdr1x1: Array[Byte] = Array[Int](
    0, 0, 0, 1, // width 1
    0, 0, 0, 1, // height 1
    8, 2, 0, 0, 0 // depth 8, truecolor, deflate, filter 0, no interlace
  ).map(_.toByte)

  // 1×1 red pixel: raw scanline = filter byte 0 + (255, 0, 0).
  // zlib stored block by hand: 78 01 header, final-stored block 01,
  // LEN 04 00, NLEN FB FF, the 4 raw bytes, then adler32 = 03 01 01 00
  // (s1 = 1+0+255+0+0 = 256 = 0x0100, s2 = 1+256+256+256 = 769 = 0x0301).
  private val idat1x1: Array[Byte] = Array[Int](
    0x78, 0x01,
    0x01, 0x04, 0x00, 0xfb, 0xff,
    0x00, 0xff, 0x00, 0x00,
    0x03, 0x01, 0x01, 0x00
  ).map(_.toByte)

  private val golden: Array[Byte] =
    Png.Signature ++ chunk("IHDR", ihdr1x1) ++ chunk("IDAT", idat1x1) ++
      chunk("IEND", Array.emptyByteArray)

  test("encoder reproduces the hand-assembled golden bytes exactly") {
    assert(Png.encodeRgb8(1, 1, (_, _) => (255, 0, 0)).toSeq == golden.toSeq)
  }

  test("decoder reads the golden bytes into top-down RGB rows") {
    val p = Png.decodeRgb8(golden)
    assert(p.width == 1 && p.height == 1)
    assert(p.rows(0).toSeq.map(_ & 0xff) == Seq(255, 0, 0))
  }

  test("encodedLen closed form matches actual encoder output") {
    for (w <- Seq(1, 3, 13); h <- Seq(1, 2, 9)) {
      val bytes = Png.encodeRgb8(w, h, (x, y) => (x % 256, y % 256, 7))
      assert(bytes.length == Png.encodedLen(w, h), s"w=$w h=$h")
    }
  }

  test("decoder inflates REAL compression, split IDATs, ancillary chunks") {
    // 2×2: rows (red, green) / (blue, white), filter 0, best compression
    val raw = Array[Int](
      0, 255, 0, 0, 0, 255, 0,
      0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val z = deflate(raw, Deflater.BEST_COMPRESSION)
    val (z1, z2) = z.splitAt(z.length / 2) // IDAT split mid-stream is legal
    val ihdr = Array[Int](0, 0, 0, 2, 0, 0, 0, 2, 8, 2, 0, 0, 0).map(_.toByte)
    val bytes = Png.Signature ++ chunk("IHDR", ihdr) ++
      chunk("tEXt", "comment\u0000hi".getBytes("US-ASCII")) ++ // ancillary: skipped
      chunk("IDAT", z1) ++ chunk("IDAT", z2) ++
      chunk("IEND", Array.emptyByteArray)
    val p = Png.decodeRgb8(bytes)
    assert(p.width == 2 && p.height == 2)
    assert(p.rows(0).toSeq.map(_ & 0xff) == Seq(255, 0, 0, 0, 255, 0))
    assert(p.rows(1).toSeq.map(_ & 0xff) == Seq(0, 0, 255, 255, 255, 255))
  }

  test("decoder reverses Sub and Up scanline filters") {
    // 2×2 target pixels: (10,20,30),(13,24,35) / (11,22,33),(14,26,38)
    // row 0 with filter 1 (Sub): first pixel literal, second = delta
    // row 1 with filter 2 (Up): deltas against row 0
    val raw = Array[Int](
      1, 10, 20, 30, 3, 4, 5,
      2, 1, 2, 3, 1, 2, 3).map(_.toByte)
    val ihdr = Array[Int](0, 0, 0, 2, 0, 0, 0, 2, 8, 2, 0, 0, 0).map(_.toByte)
    val bytes = Png.Signature ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", deflate(raw, 6)) ++ chunk("IEND", Array.emptyByteArray)
    val p = Png.decodeRgb8(bytes)
    assert(p.rows(0).toSeq.map(_ & 0xff) == Seq(10, 20, 30, 13, 24, 35))
    assert(p.rows(1).toSeq.map(_ & 0xff) == Seq(11, 22, 33, 14, 26, 38))
  }

  test("round trip over planted pixel functions") {
    for (w <- Seq(1, 3, 13); h <- Seq(1, 9)) {
      val fn = (x: Int, y: Int) => ((x * 37 + y) % 256, (y * 91) % 256, (x + 7 * y) % 256)
      val p = Png.decodeRgb8(Png.encodeRgb8(w, h, fn))
      assert(p.width == w && p.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = fn(x, y)
        assert((p.rows(y)(x * 3) & 0xff) == r, s"r at ($x,$y) w=$w h=$h")
        assert((p.rows(y)(x * 3 + 1) & 0xff) == g)
        assert((p.rows(y)(x * 3 + 2) & 0xff) == b)
      }
    }
  }

  test("Adam7 interlace round-trips pixel-exact over geometries that " +
    "exercise empty and single-pixel passes (r16)") {
    // w or h < 8 leaves some of the 7 passes empty or degenerate —
    // the classic Adam7 implementation traps
    for (w <- Seq(1, 2, 5, 8, 13); h <- Seq(1, 3, 8, 11)) {
      val fn = (x: Int, y: Int) =>
        ((x * 53 + y * 7) % 256, (y * 131 + x) % 256, (x * y + 19) % 256)
      val p = Png.decodeRgb8(Png.encodeRgb8Adam7(w, h, fn))
      assert(p.width == w && p.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = fn(x, y)
        assert((p.rows(y)(x * 3) & 0xff) == r, s"r at ($x,$y) w=$w h=$h")
        assert((p.rows(y)(x * 3 + 1) & 0xff) == g)
        assert((p.rows(y)(x * 3 + 2) & 0xff) == b)
      }
      // Adam7 and sequential encodings of the same pixels agree
      assert(p.rows.map(_.toSeq) ==
        Png.decodeRgb8(Png.encodeRgb8(w, h, fn)).rows.map(_.toSeq))
    }
    // unknown interlace method stays loud
    val bad = ihdr1x1.clone(); bad(12) = 2
    intercept[IllegalArgumentException](Png.decodeRgb8(
      Png.Signature ++ chunk("IHDR", bad) ++ chunk("IDAT", idat1x1) ++
        chunk("IEND", Array.emptyByteArray)))
  }

  test("parser rejects bad signature, CRC damage, geometry lies, truncation") {
    intercept[IllegalArgumentException](Png.decodeRgb8("not a png".getBytes))
    val crcBad = golden.clone()
    crcBad(golden.length - 5) = (crcBad(golden.length - 5) ^ 0x01).toByte // IEND CRC
    intercept[IllegalArgumentException](Png.decodeRgb8(crcBad))
    // grayscale color type: unsupported, must refuse not misread
    val gray = ihdr1x1.clone(); gray(9) = 0
    intercept[IllegalArgumentException](Png.decodeRgb8(
      Png.Signature ++ chunk("IHDR", gray) ++ chunk("IDAT", idat1x1) ++
        chunk("IEND", Array.emptyByteArray)))
    intercept[IllegalArgumentException](Png.decodeRgb8(golden.dropRight(6)))
    // filter type 5: outside the spec's 0-4, must refuse not misread
    val raw5 = Array[Int](5, 1, 2, 3).map(_.toByte)
    intercept[IllegalArgumentException](Png.decodeRgb8(
      Png.Signature ++ chunk("IHDR", ihdr1x1) ++
        chunk("IDAT", deflate(raw5, 6)) ++ chunk("IEND", Array.emptyByteArray)))
  }

  test("decoder reverses Average and Paeth filters (r16 — the types " +
    "libpng's adaptive filtering actually emits)") {
    // build the reconstructed image, then FORWARD-filter rows by hand
    // (filt = recon − predictor mod 256) per the spec, alternating
    // Average (3) and Paeth (4) rows so both see non-trivial a/b/c
    val w = 7; val h = 6
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 41 + y * 13) % 256, (x * 7 + y * 99) % 256, (x * x + y) % 256)
    val recon = Array.tabulate(h, w * 3) { (y, i) =>
      val (r, g, b) = px(i / 3, y)
      (Seq(r, g, b)(i % 3)).toByte
    }
    def rb(y: Int, i: Int): Int =
      if (y < 0 || i < 0) 0 else recon(y)(i) & 0xff
    val raw = new scala.collection.mutable.ArrayBuffer[Byte]()
    for (y <- 0 until h) {
      val ft = if (y % 2 == 0) 3 else 4
      raw += ft.toByte
      for (i <- 0 until w * 3) {
        val a = rb(y, i - 3); val b = rb(y - 1, i); val c = rb(y - 1, i - 3)
        val pred = if (ft == 3) (a + b) >> 1
        else {
          val p = a + b - c
          val da = math.abs(p - a); val db = math.abs(p - b)
          val dc = math.abs(p - c)
          if (da <= db && da <= dc) a else if (db <= dc) b else c
        }
        raw += ((rb(y, i) - pred) & 0xff).toByte
      }
    }
    val ihdr = (Seq(0, 0, 0, w, 0, 0, 0, h).map(_.toByte) ++
      Seq[Byte](8, 2, 0, 0, 0)).toArray
    val png = Png.Signature ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", deflate(raw.toArray, 6)) ++
      chunk("IEND", Array.emptyByteArray)
    val p = Png.decodeRgb8(png)
    assert(p.width == w && p.height == h)
    (0 until h).foreach { y =>
      assert(p.rows(y).toSeq == recon(y).toSeq, s"row $y")
    }
  }

  test("seam decoder: frames are the decoded rows") {
    val frames = Png.RowDecoder().sampleFrames(golden)
    assert(frames.length == 1)
    assert(frames(0).toSeq.map(_ & 0xff) == Seq(255, 0, 0))
  }

  test("format sniffing routes PNG by signature") {
    assert(graft.ops.Multimodal.detectFormat(golden) == "image/png")
    assert(graft.ops.Multimodal.detectFormat(golden.take(7)) == "unknown")
  }
}
