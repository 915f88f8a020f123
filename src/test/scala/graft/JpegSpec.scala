package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Jpeg

/** Baseline JPEG codec gates (VERDICT r12 #5): container structure,
  * block-constant exact round-trip (the property q_jpeg_decode's
  * closed-form oracle leans on), restart-marker resync, byte
  * stuffing, chroma subsampling geometry, and decoder rejection of
  * non-baseline input.
  */
class JpegSpec extends AnyFunSuite {

  /** Plant: Y constant per 8×8 block, chroma constant per 16×16 MCU —
    * the exact shape the decode query synthesizes.
    */
  private def plant(w: Int, h: Int, seed: Long):
      (Array[Int], Array[Int], Array[Int]) = {
    val y = Array.tabulate(w * h) { i =>
      val yy = i / w; val xx = i % w
      ((seed * 19 + (yy / 8) * 37 + (xx / 8) * 53) % 256).toInt
    }
    val cb = Array.tabulate(w / 2 * (h / 2)) { i =>
      val xx = i % (w / 2)
      ((seed * 29 + (xx / 8) * 41) % 256).toInt
    }
    val cr = Array.tabulate(w / 2 * (h / 2)) { i =>
      val yy = i / (w / 2)
      ((seed * 43 + (yy / 8) * 31) % 256).toInt
    }
    (y, cb, cr)
  }

  private def expectedRgb(w: Int, h: Int, seed: Long): Array[Array[Int]] =
    Array.tabulate(h * w) { i =>
      val yy = i / w; val xx = i % w
      val yv = ((seed * 19 + (yy / 8) * 37 + (xx / 8) * 53) % 256).toInt
      val cb = ((seed * 29 + (xx / 16) * 41) % 256).toInt
      val cr = ((seed * 43 + (yy / 16) * 31) % 256).toInt
      def cl(d: Double): Int = {
        val v = math.floor(d + 0.5).toInt
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      Array(cl(yv + 1.402 * (cr - 128)),
        cl(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        cl(yv + 1.772 * (cb - 128)))
    }

  test("container structure: SOI/DQT/SOF0/DHT/DRI/SOS/EOI in order, restart markers present") {
    val (y, cb, cr) = plant(48, 32, 7L)
    val bytes = Jpeg.encode420(48, 32, y, cb, cr, restartInterval = 2)
    def findMarker(m: Int, from: Int = 0): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    val sof = findMarker(0xc0)
    val dri = findMarker(0xdd)
    val sos = findMarker(0xda)
    assert(sof > 0 && dri > 0 && sos > 0 && sof < sos && dri < sos)
    assert((bytes(bytes.length - 2) & 0xff) == 0xff &&
      (bytes.last & 0xff) == 0xd9)
    // 6 MCUs at DRI=2 -> RST fires after MCUs 2 and 4: RST0 then RST1
    val rst0 = findMarker(0xd0, sos)
    val rst1 = findMarker(0xd1, sos)
    assert(rst0 > sos && rst1 > rst0, "expected RST0 then RST1 in scan")
    // and DHT carries the 4 standard tables
    assert(bytes.sliding(2).count(a =>
      (a(0) & 0xff) == 0xff && (a(1) & 0xff) == 0xc4) == 4)
  }

  test("block-constant plants round-trip pixel-exact through the lossy pipeline") {
    for (seed <- Seq(0L, 1L, 9L, 255L, 1234567L)) {
      val (y, cb, cr) = plant(48, 32, seed)
      val dec = Jpeg.decode(Jpeg.encode420(48, 32, y, cb, cr, restartInterval = 2))
      assert(dec.width == 48 && dec.height == 32)
      val exp = expectedRgb(48, 32, seed)
      var i = 0
      dec.rows.zipWithIndex.foreach { case (row, yy) =>
        var xx = 0
        while (xx < 48) {
          val e = exp(yy * 48 + xx)
          assert((row(xx * 3) & 0xff) == e(0) &&
            (row(xx * 3 + 1) & 0xff) == e(1) &&
            (row(xx * 3 + 2) & 0xff) == e(2),
            s"seed $seed pixel ($xx,$yy): got " +
              s"(${row(xx * 3) & 0xff},${row(xx * 3 + 1) & 0xff},${row(xx * 3 + 2) & 0xff}) want (${e(0)},${e(1)},${e(2)})")
          xx += 1
          i += 1
        }
      }
      assert(i == 48 * 32)
    }
  }

  test("restart markers reset DC prediction: without resync the image would shear") {
    // gradient DC across MCUs makes DC prediction carry real state; a
    // decoder that ignores RST resets decodes the wrong constants
    val w = 64; val h = 16
    val y = Array.tabulate(w * h) { i => (((i % w) / 8) * 30 + 5) % 256 }
    val cb = Array.fill(w / 2 * (h / 2))(128)
    val cr = Array.fill(w / 2 * (h / 2))(128)
    val withRst = Jpeg.decode(Jpeg.encode420(w, h, y, cb, cr, restartInterval = 1))
    val noRst = Jpeg.decode(Jpeg.encode420(w, h, y, cb, cr, restartInterval = 0))
    // both must decode the same pixels — the restart path changes the
    // bitstream (aligned RSTs, DC reset) but not the image
    assert(withRst.rows.map(_.toSeq) == noRst.rows.map(_.toSeq))
    // luma-only gray plant: r == g == b == y
    assert((withRst.rows(0)(0) & 0xff) == 5)
    assert((withRst.rows(0)(8 * 3) & 0xff) == 35)
  }

  test("byte stuffing: entropy data containing 0xFF bytes decodes (stuffed 0x00 stripped)") {
    // hunt a plant whose scan bytes contain a stuffed FF00 pair
    val found = (0L until 64L).exists { seed =>
      val (y, cb, cr) = plant(16, 16, seed)
      val bytes = Jpeg.encode420(16, 16, y, cb, cr)
      val sos = bytes.indexOfSlice(Seq(0xff.toByte, 0xda.toByte))
      val stuffed = (sos until bytes.length - 2).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0x00)
      if (stuffed) {
        val dec = Jpeg.decode(bytes) // must not choke on the FF00
        assert(dec.width == 16 && dec.height == 16)
      }
      stuffed
    }
    assert(found, "no plant produced a stuffed byte — widen the search")
  }

  test("4:2:0 geometry: one chroma sample covers a 2x2 luma quad") {
    // W=16,H=16: chroma plane is 8x8 = one block, constant 200/100
    val y = Array.fill(256)(128)
    val cb = Array.fill(64)(200)
    val cr = Array.fill(64)(100)
    val dec = Jpeg.decode(Jpeg.encode420(16, 16, y, cb, cr))
    // every pixel shares the same chroma -> constant color
    val px = dec.rows.flatMap(_.toSeq).distinct
    assert(px.length == 3, s"expected one constant color, got $px")
  }

  test("decoder rejects malformed progressive (baseline-shaped scan) and truncated input loudly") {
    val (y, cb, cr) = plant(16, 16, 3L)
    val bytes = Jpeg.encode420(16, 16, y, cb, cr)
    // flip SOF0 -> SOF2: the baseline Ss=0..Se=63 interleaved scan is
    // ILLEGAL under a progressive frame (G.1: DC scans have Se=0, AC
    // scans are single-component) — supported progressive must still
    // reject this corruption
    val prog = bytes.clone()
    val sof = prog.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    prog(sof + 1) = 0xc2.toByte
    assertThrows[IllegalArgumentException](Jpeg.decode(prog))
    assertThrows[IllegalArgumentException](Jpeg.decode(bytes.take(20)))
    assertThrows[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3)))
  }

  // ---------------------------------------------------- progressive

  /** Deterministic full-energy pixel plant (every AC path exercised:
    * runs, ZRLs, EOB runs, refinement corrections and newly
    * significant coefs at every successive-approximation level).
    */
  private def noisyPlant(w: Int, h: Int, seed: Long):
      (Array[Int], Array[Int], Array[Int]) = {
    def v(a: Long, b: Long, c: Long): Int =
      (((a * 1103515245L + b * 12345L + c * 2654435761L + seed) >>> 7) % 256).toInt
    val y = Array.tabulate(w * h)(i => v(1, i / w, i % w))
    val cb = Array.tabulate(w / 2 * (h / 2))(i => v(2, i / (w / 2), i % (w / 2)))
    val cr = Array.tabulate(w / 2 * (h / 2))(i => v(3, i / (w / 2), i % (w / 2)))
    (y, cb, cr)
  }

  test("progressive == baseline decode, bit-for-bit, on full-energy images") {
    // progressive reorders the ENTROPY CODING of the same quantized
    // coefficients, so the decoded RGB must match the baseline decode
    // exactly — one gate pinning the whole 10-scan script (DC first +
    // refine, AC spectral bands, AC successive approximation) against
    // the independently-tested baseline path
    for (seed <- 1L to 5L) {
      val (y, cb, cr) = noisyPlant(48, 32, seed)
      val base = Jpeg.decode(Jpeg.encode420(48, 32, y, cb, cr))
      val prog = Jpeg.decode(Jpeg.encodeProgressive420(48, 32, y, cb, cr))
      assert(prog.width == base.width && prog.height == base.height)
      for (r <- base.rows.indices)
        assert(java.util.Arrays.equals(prog.rows(r), base.rows(r)),
          s"seed $seed row $r differs between progressive and baseline")
    }
  }

  test("non-interleaved sequential == interleaved decode, with restarts " +
    "(r14 ADVICE: single-component baseline scans walk the component " +
    "raster, one restart-MCU per block)") {
    // same quantized coefficients, different scan structure: three
    // single-component SOS in T.81 A.2.2 raster order. Noisy plants
    // make every block distinct, so the OLD MCU-tile walk (which
    // visited Y blocks in 2×2 tile order and counted restarts per
    // tile) would scramble block placement AND desync on RST markers
    for (seed <- 11L to 13L) {
      val (y, cb, cr) = noisyPlant(48, 32, seed)
      val base = Jpeg.decode(Jpeg.encode420(48, 32, y, cb, cr))
      for (rst <- Seq(0, 3)) {
        val plan = Jpeg.decode(Jpeg.encodeSequentialPlanar420(
          48, 32, y, cb, cr, restartInterval = rst))
        assert(plan.width == base.width && plan.height == base.height)
        for (r <- base.rows.indices)
          assert(java.util.Arrays.equals(plan.rows(r), base.rows(r)),
            s"seed $seed rst $rst row $r differs between planar and interleaved")
      }
    }
  }

  test("progressive container: SOF2, ten scans, per-scan optimized DHTs") {
    val (y, cb, cr) = noisyPlant(16, 16, 9L)
    val bytes = Jpeg.encodeProgressive420(16, 16, y, cb, cr)
    def countMarker(m: Int): Int =
      bytes.sliding(2).count(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(countMarker(0xc2) == 1, "one SOF2")
    assert(countMarker(0xc0) == 0, "no SOF0")
    assert(countMarker(0xda) == 10, "libjpeg standard 10-scan script")
    // 9 Huffman-coded scans (DC refine is raw bits): scan 1 ships two
    // tables, scans 2-6 and 8-10 one each — 10 DHT segments
    assert(countMarker(0xc4) == 10, "per-scan optimized tables")
  }

  test("block-constant plants round-trip pixel-exact through the progressive pipeline") {
    // the q_jpeg_progressive closed-form-oracle property: DC-only
    // spectra survive the successive-approximation DC scans exactly
    for (seed <- Seq(1L, 7L, 12L)) {
      val (y, cb, cr) = plant(48, 32, seed)
      val dec = Jpeg.decode(Jpeg.encodeProgressive420(48, 32, y, cb, cr))
      val want = expectedRgb(48, 32, seed)
      for (yy <- 0 until 32; xx <- 0 until 48) {
        val row = dec.rows(yy)
        val exp = want(yy * 48 + xx)
        assert((row(xx * 3) & 0xff) == exp(0) &&
          (row(xx * 3 + 1) & 0xff) == exp(1) &&
          (row(xx * 3 + 2) & 0xff) == exp(2),
          s"seed $seed pixel ($xx,$yy)")
      }
    }
  }

  test("detectFormat routes real progressive payloads separately from baseline") {
    val (y, cb, cr) = noisyPlant(16, 16, 4L)
    assert(graft.ops.Multimodal.detectFormat(
      Jpeg.encodeProgressive420(16, 16, y, cb, cr)) == "image/jpeg;progressive")
    assert(graft.ops.Multimodal.detectFormat(
      Jpeg.encode420(16, 16, y, cb, cr)) == "image/jpeg")
  }
}
