package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Gif

/** GIF codec gates: container structure, LZW round-trips that force
  * every decoder path — dictionary growth across code widths (the
  * spec-appendix off-by-one), KwKwK, table-full CLEAR/reset — plus
  * format routing and loud rejection of unsupported shapes.
  */
class GifSpec extends AnyFunSuite {

  private def pal(i: Int): (Int, Int, Int) =
    ((i * 7) % 256, (i * 13) % 256, (i * 29) % 256)

  private def decodeToIdx(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    // invert the palette (injective here: i*7 mod 256 is a bijection)
    val inv = (0 until 256).map(i => (pal(i)._1 & 0xff) -> i).toMap
    val d = Gif.decode(bytes)
    assert(d.width == w && d.height == h)
    d.rows.flatMap(r => r.grouped(3).map(px => inv(px(0) & 0xff))).toArray
  }

  test("container structure: header, screen descriptor, GCT, trailer") {
    val bytes = Gif.encode8(4, 3, pal, (x, y) => (x + y * 4) % 256)
    assert(new String(bytes, 0, 6, "US-ASCII") == "GIF89a")
    assert((bytes(10) & 0x80) != 0, "global color table flag")
    assert((bytes(bytes.length - 1) & 0xff) == 0x3b, "trailer")
    assert(graft.ops.Multimodal.detectFormat(bytes) == "image/gif")
  }

  test("palette round-trip: structured image decodes pixel-exact") {
    val w = 13; val h = 9
    def idx(x: Int, y: Int): Int = (x * 11 + y * 37) % 256
    val d = Gif.decode(Gif.encode8(w, h, pal, idx))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pal(idx(x, y))
      val row = d.rows(y)
      assert((row(x * 3) & 0xff) == r && (row(x * 3 + 1) & 0xff) == g &&
        (row(x * 3 + 2) & 0xff) == b, s"pixel ($x,$y)")
    }
  }

  test("KwKwK: constant and two-symbol runs decode exactly") {
    // a constant image hits code == next on the second data code and
    // repeatedly after; aabb-style runs hit it at staggered offsets
    for ((w, h, f) <- Seq(
      (16, 8, (x: Int, y: Int) => 5),
      (16, 8, (x: Int, y: Int) => if (((x + y * 16) / 2) % 2 == 0) 3 else 250),
      (33, 7, (x: Int, y: Int) => if (x < 20) 9 else x % 4))) {
      val idx = decodeToIdx(Gif.encode8(w, h, pal, f), w, h)
      val want = Array.tabulate(w * h)(i => f(i % w, i / w))
      assert(idx.sameElements(want), s"${w}x$h run image")
    }
  }

  test("code-width growth and table-full CLEAR: dictionary-filling noise round-trips") {
    // deterministic 8-bit noise barely compresses, so the dictionary
    // marches through 9/10/11/12-bit codes and hits the 4095 CLEAR —
    // any width off-by-one (either side) desyncs at the first boundary
    val w = 192; val h = 128
    def f(x: Int, y: Int): Int =
      (((x * 1103515245L + y * 2654435761L + 12345) >>> 9) % 256).toInt
    val idx = decodeToIdx(Gif.encode8(w, h, pal, f), w, h)
    val want = Array.tabulate(w * h)(i => f(i % w, i / w))
    assert(idx.sameElements(want), "noise image round-trip")
  }

  test("rejects truncated and alien input loudly") {
    val ok = Gif.encode8(8, 8, pal, (x, y) => x)
    assertThrows[IllegalArgumentException](Gif.decode(ok.take(20)))
    assertThrows[IllegalArgumentException](Gif.decode(Array[Byte](1, 2, 3)))
    // interlaced flag flipped on sequentially-stored rows: the decoder
    // must HONOR the flag (r16 — no longer a reject), i.e. permute the
    // stream rows through the 4-pass schedule rather than ignore it
    val flipped = ok.clone()
    // image descriptor: after 6 header + 7 LSD + 768 GCT + 8-byte GCE
    val desc = 6 + 7 + 768 + 8
    assert((flipped(desc) & 0xff) == 0x2c)
    flipped(desc + 9) = (flipped(desc + 9) | 0x40).toByte
    val seq = Gif.decode(ok)
    val perm = Gif.decode(flipped)
    val order = Gif.interlaceOrder(8)
    (0 until 8).foreach { s =>
      assert(perm.rows(order(s)).toSeq == seq.rows(s).toSeq,
        s"stream row $s must land at display row ${order(s)}")
    }
  }

  test("LZW minimum code sizes 2-7 round-trip (r15: small palettes)") {
    // real-world GIFs with <256-color palettes: initial width = min+1,
    // CLEAR = 1<<min — the hard-wired-8 decoder rejected all of these
    for (mc <- 2 to 7) {
      val nColors = 1 << mc
      val w = 37; val h = 23
      def f(x: Int, y: Int): Int =
        (((x * 31 + y * 17 + mc * 7) * 2654435761L >>> 8) % nColors).toInt
      val d = Gif.decode(Gif.encode8(w, h, pal, f, minCodeSize = mc))
      assert(d.width == w && d.height == h)
      val want = Array.tabulate(w * h) { i =>
        val (r, g, b) = pal(f(i % w, i / w)); Array(r, g, b)
      }.flatten.map(_.toByte)
      assert(d.rows.flatten.toArray.sameElements(want),
        s"min code $mc round-trip")
    }
  }

  test("animated GIF: decodeFrames returns every frame, in order") {
    val w = 11; val h = 7
    val frames = (0 until 5).map { f => (x: Int, y: Int) =>
      (f * 40 + x * 3 + y) % 256
    }
    val fs = Gif.decodeFrames(Gif.encodeFrames(w, h, pal, frames))
    assert(fs.length == 5)
    fs.zipWithIndex.foreach { case (d, f) =>
      assert(d.width == w && d.height == h)
      val want = Array.tabulate(w * h) { i =>
        val (r, g, b) = pal((f * 40 + (i % w) * 3 + i / w) % 256)
        Array(r, g, b)
      }.flatten.map(_.toByte)
      assert(d.rows.flatten.toArray.sameElements(want), s"frame $f")
    }
    // the single-image API must not silently drop frames 2..5
    val ex = intercept[IllegalArgumentException](
      Gif.decode(Gif.encodeFrames(w, h, pal, frames)))
    assert(ex.getMessage.contains("decodeFrames"))
  }

  test("interlaced GIF de-interlaces pixel-exact (r16), including odd " +
    "heights where late passes dominate") {
    // the 4-pass schedule covers each row exactly once for any h
    for (h <- Seq(1, 2, 3, 7, 8, 16, 23)) {
      assert(Gif.interlaceOrder(h).sorted.toSeq == (0 until h),
        s"pass schedule must be a permutation at h=$h")
    }
    val w = 19; val h = 13
    def f(x: Int, y: Int): Int = (x * 7 + y * 29) % 256
    val plain = Gif.decode(Gif.encode8(w, h, pal, f))
    val inter = Gif.decode(Gif.encodeGif(w, h, Some(pal),
      Seq(Gif.Frame(f, interlaced = true))))
    assert(inter.rows.map(_.toSeq) == plain.rows.map(_.toSeq),
      "interlaced and sequential encodings must decode identically")
    // a decoder that ignored the flag would emit pass-ordered rows
    assert(inter.rows.head.toSeq ==
      (0 until w).flatMap { x =>
        val (r, g, b) = pal(f(x, 0)); Seq(r.toByte, g.toByte, b.toByte)
      })
  }

  test("local color tables override the global one per frame (r16)") {
    val w = 9; val h = 5
    def palA(i: Int): (Int, Int, Int) = (i, 0, 255 - i)
    def palB(i: Int): (Int, Int, Int) = (0, i, i / 2)
    def f(x: Int, y: Int): Int = (x + y * w) % 256
    // frame 1 uses the GLOBAL table, frame 2 its LOCAL one
    val fs = Gif.decodeFrames(Gif.encodeGif(w, h, Some(palA),
      Seq(Gif.Frame(f), Gif.Frame(f, localPalette = Some(palB)))))
    assert(fs.length == 2)
    def want(pal: Int => (Int, Int, Int)): Seq[Byte] =
      (0 until w * h).flatMap { i =>
        val (r, g, b) = pal(f(i % w, i / w)); Seq(r.toByte, g.toByte, b.toByte)
      }
    assert(fs(0).rows.flatten.toSeq == want(palA))
    assert(fs(1).rows.flatten.toSeq == want(palB),
      "the local table must win for its frame only")
    // no global table at all: local-only file decodes; a frame with
    // NEITHER table is loud
    val localOnly = Gif.decodeFrames(Gif.encodeGif(w, h, None,
      Seq(Gif.Frame(f, localPalette = Some(palB)))))
    assert(localOnly.head.rows.flatten.toSeq == want(palB))
    val ex = intercept[IllegalArgumentException](
      Gif.decodeFrames(Gif.encodeGif(w, h, None, Seq(Gif.Frame(f)))))
    assert(ex.getMessage.contains("no color table"))
  }

  test("partial-frame compositing: regions, disposal 0/2/3, and " +
    "transparency all honored (r16 — the real animated-GIF layout)") {
    val w = 12; val h = 10
    // base: full screen, index = x + y (opaque)
    def base(x: Int, y: Int): Int = (x + y) % 256
    // overlay A at (3,2) 5x4, disposal 2 (region restores to bg after),
    // all-opaque constant 200
    // overlay B at (6,5) 4x3, transparent index 7 in a checker pattern
    val frames = Seq(
      Gif.Frame(base),
      Gif.Frame((_, _) => 200, region = Some((3, 2, 5, 4)), disposal = 2),
      Gif.Frame((x, y) => if ((x + y) % 2 == 0) 7 else 90,
        region = Some((6, 5, 4, 3)), transparent = Some(7)))
    val fs = Gif.decodeFrames(Gif.encodeGif(w, h, Some(pal), frames))
    assert(fs.length == 3)
    assert(fs.forall(f => f.width == w && f.height == h),
      "every composited frame is logical-screen-sized")
    // reference compositor: bg = pal(0) (background index 0)
    val bgc = pal(0)
    def rgbAt(f: Int, x: Int, y: Int): (Int, Int, Int) = f match {
      case 0 => pal(base(x, y))
      case 1 => // base + opaque overlay A
        if (x >= 3 && x < 8 && y >= 2 && y < 6) pal(200) else pal(base(x, y))
      case 2 => // A's region restored to BG (disposal 2), then B drawn
        // with transparent pixels leaving the canvas
        val underA = x >= 3 && x < 8 && y >= 2 && y < 6
        val under = if (underA) bgc else pal(base(x, y))
        if (x >= 6 && x < 10 && y >= 5 && y < 8) {
          val lx = x - 6; val ly = y - 5
          if ((lx + ly) % 2 == 0) under else pal(90)
        } else under
    }
    for (f <- 0 until 3; y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbAt(f, x, y)
      val row = fs(f).rows(y)
      assert((row(x * 3) & 0xff, row(x * 3 + 1) & 0xff,
        row(x * 3 + 2) & 0xff) == ((r, g, b)),
        s"frame $f pixel ($x,$y)")
    }
    // disposal 3: a frame drawn over the base REVERTS after emission
    val fs3 = Gif.decodeFrames(Gif.encodeGif(w, h, Some(pal), Seq(
      Gif.Frame(base),
      Gif.Frame((_, _) => 200, region = Some((1, 1, 3, 3)), disposal = 3),
      Gif.Frame((_, _) => 99, region = Some((9, 8, 2, 1))))))
    val prev = fs3(0).rows.map(_.toSeq)
    val after = fs3(2).rows.map(_.toSeq)
    // outside B's tiny region, frame 2 must equal frame 0 exactly —
    // overlay A was restored-to-previous
    for (y <- 0 until h if y != 8) assert(after(y) == prev(y), s"row $y")
    // a region outside the logical screen stays loud
    val ex = intercept[IllegalArgumentException](
      Gif.encodeGif(w, h, Some(pal),
        Seq(Gif.Frame(base, region = Some((8, 8, 8, 8))))))
    assert(ex.getMessage.contains("region"))
  }

  test("interlaced + local-palette + small min-code compose (the " +
    "real-world web-GIF shape)") {
    val w = 21; val h = 11; val mc = 4
    def palB(i: Int): (Int, Int, Int) = (i * 16, 255 - i * 16, i)
    def f(x: Int, y: Int): Int = (x * 3 + y * 5) % (1 << mc)
    val d = Gif.decode(Gif.encodeGif(w, h, None,
      Seq(Gif.Frame(f, localPalette = Some(palB), interlaced = true)),
      minCodeSize = mc))
    val want = (0 until w * h).flatMap { i =>
      val (r, g, b) = palB(f(i % w, i / w)); Seq(r.toByte, g.toByte, b.toByte)
    }
    assert(d.rows.flatten.toSeq == want)
  }
}
