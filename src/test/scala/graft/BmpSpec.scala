package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bmp

/** BMP writer/parser invariants (q_media_decode). The golden-bytes
  * test exists because the declared query only proves the ROUND TRIP —
  * an encoder bug mirrored by a decoder bug (both flipping rows, both
  * skipping padding) would cancel there. The bytes below are
  * hand-written straight from the public format spec, so the encoder
  * and decoder are each pinned to the spec independently.
  */
class BmpSpec extends AnyFunSuite {

  // 2×2 24-bit BMP, hand-assembled: top row (red, green), bottom row
  // (blue, white). Stored bottom-up, BGR, rows padded 6 → 8 bytes.
  private val golden: Array[Byte] = Array[Int](
    'B', 'M',             // magic
    70, 0, 0, 0,          // file size = 14 + 40 + 2*8
    0, 0, 0, 0,           // reserved
    54, 0, 0, 0,          // pixel-data offset
    40, 0, 0, 0,          // DIB header size
    2, 0, 0, 0,           // width
    2, 0, 0, 0,           // height (positive = bottom-up)
    1, 0,                 // planes
    24, 0,                // bpp
    0, 0, 0, 0,           // compression = BI_RGB
    16, 0, 0, 0,          // image size
    0x13, 0x0b, 0, 0,     // 2835 px/m
    0x13, 0x0b, 0, 0,
    0, 0, 0, 0,           // palette
    0, 0, 0, 0,           // important
    // stored first: BOTTOM image row = (blue, white), BGR + 2 pad
    255, 0, 0,  255, 255, 255,  0, 0,
    // stored second: TOP image row = (red, green), BGR + 2 pad
    0, 0, 255,  0, 255, 0,  0, 0
  ).map(_.toByte)

  private val pixels: (Int, Int) => (Int, Int, Int) = {
    case (0, 0) => (255, 0, 0)   // top-left red
    case (1, 0) => (0, 255, 0)   // top-right green
    case (0, 1) => (0, 0, 255)   // bottom-left blue
    case (1, 1) => (255, 255, 255)
    case _      => (0, 0, 0)
  }

  test("encoder reproduces the hand-written golden bytes exactly") {
    assert(Bmp.encode24(2, 2, pixels).toSeq == golden.toSeq)
  }

  test("decoder reads the golden bytes into top-down RGB rows") {
    val p = Bmp.decode24(golden)
    assert(p.width == 2 && p.height == 2)
    assert(p.rows(0).toSeq.map(_ & 0xff) == Seq(255, 0, 0, 0, 255, 0))
    assert(p.rows(1).toSeq.map(_ & 0xff) == Seq(0, 0, 255, 255, 255, 255))
  }

  test("decoder honours a non-standard pixel-data offset") {
    // legal BMPs may carry extra header bytes before the pixel array
    val shifted = golden.clone()
    val moved = shifted.take(54) ++ Array.fill[Byte](6)(0x7f.toByte) ++
      shifted.drop(54)
    moved(10) = 60 // dataOffset 54 -> 60
    moved(2) = 76  // file size += 6
    val p = Bmp.decode24(moved)
    assert(p.rows(0).toSeq.map(_ & 0xff) == Seq(255, 0, 0, 0, 255, 0))
  }

  test("round trip over awkward widths exercises row padding") {
    for (w <- Seq(1, 2, 3, 5, 15); h <- Seq(1, 2, 8)) {
      val fn = (x: Int, y: Int) => ((x * 37 + y) % 256, (y * 91) % 256, (x + 7 * y) % 256)
      val p = Bmp.decode24(Bmp.encode24(w, h, fn))
      assert(p.width == w && p.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = fn(x, y)
        assert((p.rows(y)(x * 3) & 0xff) == r, s"r at ($x,$y) w=$w h=$h")
        assert((p.rows(y)(x * 3 + 1) & 0xff) == g)
        assert((p.rows(y)(x * 3 + 2) & 0xff) == b)
      }
    }
  }

  test("parser rejects non-BMP, wrong bpp, compressed and truncated input") {
    intercept[IllegalArgumentException](Bmp.decode24("not a bmp at all, sorry".getBytes))
    val bad1 = golden.clone(); bad1(28) = 8 // bpp 24 -> 8
    intercept[IllegalArgumentException](Bmp.decode24(bad1))
    val bad2 = golden.clone(); bad2(30) = 1 // compression BI_RLE8
    intercept[IllegalArgumentException](Bmp.decode24(bad2))
    intercept[IllegalArgumentException](Bmp.decode24(golden.take(60)))
  }

  test("seam decoder: frames are the decoded rows") {
    val frames = Bmp.RowDecoder().sampleFrames(golden)
    assert(frames.length == 2)
    assert(frames(0).toSeq.map(_ & 0xff) == Seq(255, 0, 0, 0, 255, 0))
  }
}
