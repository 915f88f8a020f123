package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Dependency-free JPEG/JFIF codec (VERDICT r12 #5, progressive decode
  * VERDICT r13 #10) — the dominant image container of any web-scale
  * multimodal corpus, and the lossy-compressed corner BMP (raw) and PNG
  * (lossless deflate) do not cover. Follows the `graft.ops.Png`
  * precedent: a from-scratch encoder (so queries can plant synthetic
  * payloads with closed-form oracles) plus a general decoder behind the
  * same [[Multimodal.Decoder]] seam, with JpegSpec pinning golden bytes
  * and the decoder's marker/stuffing/restart handling independently.
  *
  * Spec coverage (ITU-T T.81 baseline sequential + progressive DCT):
  *   - encoder: SOI/DQT/SOF0/DHT/DRI/SOS/EOI, 4:2:0 subsampling
  *     (2×2/1×1/1×1), standard Annex K Huffman tables, DC DPCM +
  *     AC run-length (ZRL/EOB), byte stuffing (FF→FF00), restart
  *     markers RST0..7 with byte-aligned 1-padding and DC reset;
  *   - progressive encoder ([[encodeProgressive420]]): SOF2 with the
  *     libjpeg standard 10-scan script — interleaved DC first scan
  *     (Al=1) + DC refinement, per-component AC spectral-selection
  *     first scans (Al=2/1) + successive-approximation refinement
  *     scans (Ah=2→1→0), EOB-run accumulation with buffered correction
  *     bits, and PER-SCAN OPTIMIZED Huffman tables built by the T.81
  *     Annex K.2 procedure (mandatory in practice: the Annex K fixed
  *     tables carry no EOBn>0 symbols, so real progressive streams —
  *     libjpeg's included — always ship custom DHTs);
  *   - decoder: SOF0 baseline AND SOF2 progressive with 1 or 3
  *     components and sampling factors in {1,2}, multi-scan decode
  *     into a persistent coefficient store (DC first/refine, AC
  *     first/refine with EOB runs, per T.81 G.2 / the jdphuff
  *     reference structure), multi-table DQT/DHT segments with
  *     between-scan redefinition, DRI, stuffed-byte removal, restart
  *     resync, dequantize, float IDCT, replicated chroma upsampling,
  *     YCbCr→RGB. Progressive and baseline share every stage after
  *     entropy decode, so `decode(encodeProgressive420(img)) ==
  *     decode(encode420(img))` BIT-FOR-BIT on arbitrary images (the
  *     two codings carry identical coefficients) — the JpegSpec gate
  *     that pins the whole progressive entropy path against the
  *     baseline one.
  *
  * Exactness contract the decode query leans on: with all-ones
  * quantization tables, block-constant planes survive
  * FDCT→quantize→Huffman→decode→IDCT bit-exactly (a constant block's
  * spectrum is DC-only, DC = 8·(v−128) is exactly representable, the
  * AC float residue < 1e-12 rounds to zero, and the IDCT of a pure-DC
  * block is the constant back), so the oracle can state decoded RGB in
  * closed form even though JPEG is a lossy codec. The YCbCr→RGB chain
  * is written in one fixed IEEE operation order (floor(x + 0.5),
  * left-associated) so DuckDB replays it bit-for-bit.
  */
object Jpeg {

  // ------------------------------------------------------------ tables

  /** Zig-zag scan order: zigzag(i) = raster index of the i-th coef. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Standard Huffman tables, ITU-T T.81 Annex K.3 (public spec).
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman codes from a BITS/HUFFVAL pair (T.81 C.2). */
  private def buildCodes(bits: Array[Int],
      vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out += ((vals(k) & 0xff) -> ((code, len)))
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private lazy val DcLumCodes = buildCodes(DcLumBits, DcLumVals)
  private lazy val AcLumCodes = buildCodes(AcLumBits, AcLumVals)
  private lazy val DcChrCodes = buildCodes(DcChrBits, DcChrVals)
  private lazy val AcChrCodes = buildCodes(AcChrBits, AcChrVals)

  private lazy val CosTable: Array[Double] = {
    val t = new Array[Double](64) // t(x*8+u) = cos((2x+1)uπ/16)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // ------------------------------------------------------------ encoder

  private final class BitWriter(out: ArrayBuffer[Byte]) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out += acc.toByte
          if ((acc & 0xff) == 0xff) out += 0x00.toByte // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (T.81 restart/EOI padding). */
    def flush(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  private def magnitudeCategory(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** FDCT + round-quantize (all-ones table) of one level-shifted
    * block. Separable row–column form (two 1-D passes, 1024 vs 4096
    * multiplies) — the constant-block exactness argument is unchanged:
    * the column pass of a constant block is exactly 8c in row 0 and a
    * sub-1e-12 residue elsewhere, and the row pass preserves both.
    */
  private def fdctQuant(block: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64) // tmp(v*8+x) = Σ_y f(y,x)·cos_y(v)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          s += block(y * 8 + x) * CosTable(y * 8 + v)
          y += 1
        }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    v = 0
    while (v < 8) {
      val cv = if (v == 0) InvSqrt2 else 1.0
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += tmp(v * 8 + x) * CosTable(x * 8 + u)
          x += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = math.round(0.25 * cu * cv * s).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  private def encodeBlock(bw: BitWriter, coefs: Array[Int], dcPred: Int,
      dcCodes: Map[Int, (Int, Int)], acCodes: Map[Int, (Int, Int)]): Int = {
    // DC: DPCM category + magnitude bits
    val dc = coefs(0)
    val diff = dc - dcPred
    val cat = magnitudeCategory(diff)
    val (dcode, dlen) = dcCodes(cat)
    bw.put(dcode, dlen)
    if (cat > 0) {
      val bits = if (diff < 0) diff + (1 << cat) - 1 else diff
      bw.put(bits, cat)
    }
    // AC: run-length of zeros + (run, size) symbol + magnitude bits
    var run = 0
    var i = 1
    while (i < 64) {
      val c = coefs(Zigzag(i))
      if (c == 0) run += 1
      else {
        while (run > 15) { val (z, zl) = acCodes(0xf0); bw.put(z, zl); run -= 16 }
        val sz = magnitudeCategory(c)
        val (acode, alen) = acCodes((run << 4) | sz)
        bw.put(acode, alen)
        val bits = if (c < 0) c + (1 << sz) - 1 else c
        bw.put(bits, sz)
        run = 0
      }
      i += 1
    }
    if (run > 0) { val (e, el) = acCodes(0x00); bw.put(e, el) } // EOB
    dc
  }

  private def seg(out: ArrayBuffer[Byte], marker: Int, body: Array[Byte]): Unit = {
    out += 0xff.toByte; out += marker.toByte
    val len = body.length + 2
    out += ((len >> 8) & 0xff).toByte; out += (len & 0xff).toByte
    out ++= body
  }

  private def dhtBody(tcTh: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] =
    (Array(tcTh.toByte) ++ (1 to 16).map(bits(_).toByte) ++ vals)

  /** Encode a 4:2:0 baseline JFIF image from YCbCr planes. `yPlane` is
    * w×h row-major; `cbPlane`/`crPlane` are (w/2)×(h/2) (the caller
    * performs the 2×2 reduction — for block-constant plants it is
    * exact). w and h must be multiples of 16. `restartInterval` > 0
    * emits DRI + RST0..7 every that many MCUs.
    */
  def encode420(w: Int, h: Int, yPlane: Array[Int], cbPlane: Array[Int],
      crPlane: Array[Int], restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, s"dims must be MCU-aligned: ${w}x$h")
    require(yPlane.length == w * h && cbPlane.length == w * h / 4 &&
      crPlane.length == w * h / 4, "plane sizes")
    val out = ArrayBuffer.empty[Byte]
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    // DQT: two all-ones 8-bit tables (id 0 luma, id 1 chroma)
    seg(out, 0xdb, (Array(0x00.toByte) ++ Array.fill(64)(1.toByte)))
    seg(out, 0xdb, (Array(0x01.toByte) ++ Array.fill(64)(1.toByte)))
    // SOF0: baseline, 8-bit, 3 components, 2x2 / 1x1 / 1x1
    seg(out, 0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dhtBody(0x00, DcLumBits, DcLumVals))
    seg(out, 0xc4, dhtBody(0x10, AcLumBits, AcLumVals))
    seg(out, 0xc4, dhtBody(0x01, DcChrBits, DcChrVals))
    seg(out, 0xc4, dhtBody(0x11, AcChrBits, AcChrVals))
    if (restartInterval > 0)
      seg(out, 0xdd, Array[Byte](((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    seg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val bw = new BitWriter(out)
    val mcusX = w / 16
    val mcusY = h / 16
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var rstIdx = 0
    var mcuCount = 0
    val block = new Array[Int](64)
    def loadBlock(plane: Array[Int], pw: Int, bx: Int, by: Int): Unit = {
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          block(yy * 8 + xx) = plane((by * 8 + yy) * pw + bx * 8 + xx) - 128
          xx += 1
        }
        yy += 1
      }
    }
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount > 0 && mcuCount % restartInterval == 0) {
          bw.flush()
          out += 0xff.toByte; out += (0xd0 + rstIdx).toByte
          rstIdx = (rstIdx + 1) % 8
          dcY = 0; dcCb = 0; dcCr = 0
        }
        // 4 Y blocks in (v, h) raster order, then Cb, Cr
        var v = 0
        while (v < 2) {
          var hh = 0
          while (hh < 2) {
            loadBlock(yPlane, w, mx * 2 + hh, my * 2 + v)
            dcY = encodeBlock(bw, fdctQuant(block), dcY, DcLumCodes, AcLumCodes)
            hh += 1
          }
          v += 1
        }
        loadBlock(cbPlane, w / 2, mx, my)
        dcCb = encodeBlock(bw, fdctQuant(block), dcCb, DcChrCodes, AcChrCodes)
        loadBlock(crPlane, w / 2, mx, my)
        dcCr = encodeBlock(bw, fdctQuant(block), dcCr, DcChrCodes, AcChrCodes)
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out += 0xff.toByte; out += 0xd9.toByte // EOI
    out.toArray
  }

  /** Encode the same 4:2:0 baseline image as THREE NON-INTERLEAVED
    * sequential scans (one SOS per component — T.81 A.2.2: each scan
    * walks its component's own block grid in raster order, and the
    * restart-MCU is ONE block). Same plane contract and identical DCT
    * coefficients as [[encode420]], so decodes of the two encodings
    * must agree bit-for-bit — the JpegSpec gate for the r14-ADVICE
    * decoder fix (single-component baseline scans previously walked
    * MCU-tile order and counted restarts per 4-block tile).
    */
  def encodeSequentialPlanar420(w: Int, h: Int, yPlane: Array[Int],
      cbPlane: Array[Int], crPlane: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, s"dims must be MCU-aligned: ${w}x$h")
    require(yPlane.length == w * h && cbPlane.length == w * h / 4 &&
      crPlane.length == w * h / 4, "plane sizes")
    val out = ArrayBuffer.empty[Byte]
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    seg(out, 0xdb, (Array(0x00.toByte) ++ Array.fill(64)(1.toByte)))
    seg(out, 0xdb, (Array(0x01.toByte) ++ Array.fill(64)(1.toByte)))
    // SOF0: baseline, 8-bit, 3 components, 2x2 / 1x1 / 1x1
    seg(out, 0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dhtBody(0x00, DcLumBits, DcLumVals))
    seg(out, 0xc4, dhtBody(0x10, AcLumBits, AcLumVals))
    seg(out, 0xc4, dhtBody(0x01, DcChrBits, DcChrVals))
    seg(out, 0xc4, dhtBody(0x11, AcChrBits, AcChrVals))
    if (restartInterval > 0)
      seg(out, 0xdd, Array[Byte](((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    val planes = Array(yPlane, cbPlane, crPlane)
    val pw = Array(w, w / 2, w / 2)
    val bw8 = Array(w / 8, w / 16, w / 16)
    val bh8 = Array(h / 8, h / 16, h / 16)
    val block = new Array[Int](64)
    var ci = 0
    while (ci < 3) {
      val tbl: Byte = if (ci == 0) 0x00 else 0x11
      seg(out, 0xda, Array[Byte](1, (ci + 1).toByte, tbl, 0, 63, 0))
      val bw = new BitWriter(out)
      val dcCodes = if (ci == 0) DcLumCodes else DcChrCodes
      val acCodes = if (ci == 0) AcLumCodes else AcChrCodes
      var pred = 0
      var rstIdx = 0
      var cnt = 0
      var bi = 0
      val nBlocks = bw8(ci) * bh8(ci)
      while (bi < nBlocks) {
        if (restartInterval > 0 && cnt > 0 && cnt % restartInterval == 0) {
          bw.flush()
          out += 0xff.toByte; out += (0xd0 + rstIdx).toByte
          rstIdx = (rstIdx + 1) % 8
          pred = 0
        }
        val bx = bi % bw8(ci); val by = bi / bw8(ci)
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            block(yy * 8 + xx) =
              planes(ci)((by * 8 + yy) * pw(ci) + bx * 8 + xx) - 128
            xx += 1
          }
          yy += 1
        }
        pred = encodeBlock(bw, fdctQuant(block), pred, dcCodes, acCodes)
        cnt += 1
        bi += 1
      }
      bw.flush()
      ci += 1
    }
    out += 0xff.toByte; out += 0xd9.toByte // EOI
    out.toArray
  }

  // ------------------------------------------- progressive encoder

  /** Optimal Huffman table from symbol frequencies — the T.81 Annex
    * K.2 procedure (code-size merge, 16-bit length adjustment, one
    * reserved all-ones symbol). Returns (BITS[0..16], HUFFVAL).
    */
  private def buildOptimalTable(freqIn: Array[Long]): (Array[Int], Array[Byte]) = {
    val freq = java.util.Arrays.copyOf(freqIn, 257)
    freq(256) = 1 // reserved: guarantees no real symbol gets all-ones
    val codesize = new Array[Int](257)
    val others = Array.fill(257)(-1)
    var merging = true
    while (merging) {
      var v1 = -1; var least = Long.MaxValue
      var i = 0
      while (i <= 256) { // least freq; ties to the HIGHER symbol value
        if (freq(i) > 0 && freq(i) <= least) { v1 = i; least = freq(i) }
        i += 1
      }
      var v2 = -1; least = Long.MaxValue
      i = 0
      while (i <= 256) {
        if (i != v1 && freq(i) > 0 && freq(i) <= least) { v2 = i; least = freq(i) }
        i += 1
      }
      if (v2 < 0) merging = false
      else {
        freq(v1) += freq(v2); freq(v2) = 0
        codesize(v1) += 1
        while (others(v1) >= 0) { v1 = others(v1); codesize(v1) += 1 }
        others(v1) = v2
        codesize(v2) += 1
        while (others(v2) >= 0) { v2 = others(v2); codesize(v2) += 1 }
      }
    }
    val bits = new Array[Int](33)
    var s = 0
    while (s <= 256) { if (codesize(s) > 0) bits(codesize(s)) += 1; s += 1 }
    var i = 32 // limit code lengths to 16 (K.2 Figure K.3)
    while (i > 16) {
      while (bits(i) > 0) {
        var j = i - 2
        while (bits(j) == 0) j -= 1
        bits(i) -= 2; bits(i - 1) += 1; bits(j + 1) += 2; bits(j) -= 1
      }
      i -= 1
    }
    while (bits(i) == 0) i -= 1
    bits(i) -= 1 // drop the reserved symbol
    val vals = (0 until 256).filter(codesize(_) > 0)
      .sortBy(v => (codesize(v), v)).map(_.toByte).toArray
    (java.util.Arrays.copyOf(bits, 17), vals)
  }

  /** Two-pass scan emitter: pass 1 counts symbol frequencies (bits
    * ignored), pass 2 Huffman-codes against the per-scan optimal
    * tables built from those counts.
    */
  private sealed trait SymSink {
    def sym(tbl: Int, s: Int): Unit
    def bits(v: Int, n: Int): Unit
  }
  private final class FreqSink(val freq: Array[Array[Long]]) extends SymSink {
    def sym(tbl: Int, s: Int): Unit = freq(tbl)(s) += 1
    def bits(v: Int, n: Int): Unit = ()
  }
  private final class EmitSink(bw: BitWriter,
      codes: Array[Map[Int, (Int, Int)]]) extends SymSink {
    def sym(tbl: Int, s: Int): Unit = {
      val (c, l) = codes(tbl)(s); bw.put(c, l)
    }
    def bits(v: Int, n: Int): Unit = if (n > 0) bw.put(v, n)
  }

  /** One progressive scan: spectral band [ss, se], successive
    * approximation ah→al, over `comps` (component indices; >1 ⇒
    * interleaved DC scan). `nTables` = distinct Huffman tables used
    * (interleaved DC: 0 luma / 1 chroma; AC scans: table 0 only).
    */
  private final case class ProgScan(comps: Seq[Int], ss: Int, se: Int,
      ah: Int, al: Int, nTables: Int)

  /** The libjpeg standard 3-component progressive script (jcparam.c):
    * DC first (Al=1) interleaved → Y low-band AC → chroma full-band AC
    * → Y high-band AC → Y AC refine (2→1) → DC refine → chroma AC
    * refine → Y AC refine (1→0).
    */
  private val ProgScript = Seq(
    ProgScan(Seq(0, 1, 2), 0, 0, 0, 1, 2),
    ProgScan(Seq(0), 1, 5, 0, 2, 1),
    ProgScan(Seq(2), 1, 63, 0, 1, 1),
    ProgScan(Seq(1), 1, 63, 0, 1, 1),
    ProgScan(Seq(0), 6, 63, 0, 2, 1),
    ProgScan(Seq(0), 1, 63, 2, 1, 1),
    ProgScan(Seq(0, 1, 2), 0, 0, 1, 0, 0),
    ProgScan(Seq(2), 1, 63, 1, 0, 1),
    ProgScan(Seq(1), 1, 63, 1, 0, 1),
    ProgScan(Seq(0), 1, 63, 1, 0, 1))

  /** Encode a 4:2:0 PROGRESSIVE (SOF2) JFIF image from YCbCr planes —
    * same plane contract as [[encode420]]; the DCT coefficients are
    * identical to the baseline encoding (progressive differs only in
    * entropy-coding order), which is the JpegSpec equality gate.
    */
  def encodeProgressive420(w: Int, h: Int, yPlane: Array[Int],
      cbPlane: Array[Int], crPlane: Array[Int]): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, s"dims must be MCU-aligned: ${w}x$h")
    require(yPlane.length == w * h && cbPlane.length == w * h / 4 &&
      crPlane.length == w * h / 4, "plane sizes")
    // phase 1: FDCT every block into per-component stores (raster order)
    val bw8 = Array(w / 8, w / 16, w / 16) // blocks across, per comp
    val bh8 = Array(h / 8, h / 16, h / 16)
    val planes = Array(yPlane, cbPlane, crPlane)
    val pw = Array(w, w / 2, w / 2)
    val store: Array[Array[Array[Int]]] = Array.tabulate(3) { ci =>
      val block = new Array[Int](64)
      Array.tabulate(bw8(ci) * bh8(ci)) { bi =>
        val bx = bi % bw8(ci); val by = bi / bw8(ci)
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            block(yy * 8 + xx) =
              planes(ci)((by * 8 + yy) * pw(ci) + bx * 8 + xx) - 128
            xx += 1
          }
          yy += 1
        }
        fdctQuant(block)
      }
    }

    val out = ArrayBuffer.empty[Byte]
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    seg(out, 0xdb, (Array(0x00.toByte) ++ Array.fill(64)(1.toByte)))
    seg(out, 0xdb, (Array(0x01.toByte) ++ Array.fill(64)(1.toByte)))
    // SOF2: progressive, 8-bit, 3 components, 2x2 / 1x1 / 1x1
    seg(out, 0xc2, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))

    /** Emit one scan's symbol/bit stream into `sink`. The DC-scan MCU
      * walk mirrors the decoder's interleaved order; AC scans are
      * single-component raster walks per T.81 A.2.2.
      */
    def runScan(sc: ProgScan, sink: SymSink): Unit = {
      if (sc.ss == 0 && sc.ah == 0) {
        // DC first: interleaved MCU order, DPCM of the Al-shifted DC
        val pred = new Array[Int](3)
        val mcusY = h / 16; val mcusX = w / 16
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            def one(ci: Int, bx: Int, by: Int): Unit = {
              val v = store(ci)(by * bw8(ci) + bx)(0) >> sc.al // arith shift (G.1.2.1)
              val diff = v - pred(ci); pred(ci) = v
              val cat = magnitudeCategory(diff)
              sink.sym(if (ci == 0) 0 else 1, cat)
              if (cat > 0)
                sink.bits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
            }
            var v = 0
            while (v < 2) {
              var hh = 0
              while (hh < 2) { one(0, mx * 2 + hh, my * 2 + v); hh += 1 }
              v += 1
            }
            one(1, mx, my); one(2, mx, my)
            mx += 1
          }
          my += 1
        }
      } else if (sc.ss == 0) {
        // DC refine: one raw bit per block, interleaved MCU order
        val mcusY = h / 16; val mcusX = w / 16
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            def one(ci: Int, bx: Int, by: Int): Unit =
              sink.bits((store(ci)(by * bw8(ci) + bx)(0) >> sc.al) & 1, 1)
            var v = 0
            while (v < 2) {
              var hh = 0
              while (hh < 2) { one(0, mx * 2 + hh, my * 2 + v); hh += 1 }
              v += 1
            }
            one(1, mx, my); one(2, mx, my)
            mx += 1
          }
          my += 1
        }
      } else if (sc.ah == 0) {
        // AC first (G.1.2.2): magnitude-shifted band, ZRL + EOB runs
        val ci = sc.comps.head
        var eobrun = 0
        def flushEob(): Unit = if (eobrun > 0) {
          var nb = 0; var t = eobrun
          while ({ t >>= 1; t != 0 }) nb += 1
          sink.sym(0, nb << 4)
          if (nb > 0) sink.bits(eobrun & ((1 << nb) - 1), nb)
          eobrun = 0
        }
        var bi = 0
        while (bi < store(ci).length) {
          val cf = store(ci)(bi)
          var r = 0
          var k = sc.ss
          while (k <= sc.se) {
            val c = cf(Zigzag(k))
            val v = if (c >= 0) c >> sc.al else -((-c) >> sc.al) // point transform
            if (v == 0) r += 1
            else {
              flushEob()
              while (r > 15) { sink.sym(0, 0xf0); r -= 16 }
              val sz = magnitudeCategory(v)
              sink.sym(0, (r << 4) | sz)
              sink.bits(if (v < 0) v + (1 << sz) - 1 else v, sz)
              r = 0
            }
            k += 1
          }
          if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) flushEob() }
          bi += 1
        }
        flushEob()
      } else {
        // AC refine (G.1.2.3 / the jcphuff structure): newly
        // significant coefs as (run,1) symbols, already-significant
        // coefs as buffered correction bits, EOB runs carrying their
        // pending corrections
        val ci = sc.comps.head
        var eobrun = 0
        val pend = ArrayBuffer.empty[Int] // correction bits riding the EOB run
        def flushEob(): Unit = if (eobrun > 0 || pend.nonEmpty) {
          var nb = 0; var t = eobrun
          while ({ t >>= 1; t != 0 }) nb += 1
          sink.sym(0, nb << 4)
          if (nb > 0) sink.bits(eobrun & ((1 << nb) - 1), nb)
          pend.foreach(b => sink.bits(b, 1))
          pend.clear()
          eobrun = 0
        }
        var bi = 0
        while (bi < store(ci).length) {
          val cf = store(ci)(bi)
          val absv = Array.tabulate(sc.se + 1) { k =>
            if (k < sc.ss) 0 else math.abs(cf(Zigzag(k))) >> sc.al
          }
          var eobIdx = sc.ss - 1
          var k = sc.ss
          while (k <= sc.se) { if (absv(k) == 1) eobIdx = k; k += 1 }
          var r = 0
          val br = ArrayBuffer.empty[Int]
          k = sc.ss
          while (k <= sc.se) {
            val t = absv(k)
            if (t == 0) r += 1
            else {
              // fold trailing ZRLs into the EOB run when no newly
              // significant coef follows (k <= eobIdx guard, jcphuff)
              while (r > 15 && k <= eobIdx) {
                flushEob()
                sink.sym(0, 0xf0); r -= 16
                br.foreach(b => sink.bits(b, 1)); br.clear()
              }
              if (t > 1) br += (t & 1) // correction bit
              else { // newly significant
                flushEob()
                sink.sym(0, (r << 4) | 1)
                sink.bits(if (cf(Zigzag(k)) < 0) 0 else 1, 1)
                br.foreach(b => sink.bits(b, 1)); br.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || br.nonEmpty) {
            eobrun += 1
            pend ++= br
            if (eobrun == 0x7fff || pend.length > 900) flushEob()
          }
          bi += 1
        }
        flushEob()
      }
    }

    for (sc <- ProgScript) {
      // pass 1: per-scan optimal Huffman tables from symbol counts
      val codes: Array[Map[Int, (Int, Int)]] =
        if (sc.nTables == 0) Array.empty
        else {
          val fs = new FreqSink(Array.fill(sc.nTables)(new Array[Long](257)))
          runScan(sc, fs)
          Array.tabulate(sc.nTables) { t =>
            val (bits, vals) = buildOptimalTable(fs.freq(t))
            val tc = if (sc.ss == 0) 0 else 1 // DC vs AC table class
            seg(out, 0xc4, dhtBody((tc << 4) | t, bits, vals))
            buildCodes(bits, vals)
          }
        }
      // SOS header: per-component (id, TdTa), then Ss/Se/AhAl
      val hdr = ArrayBuffer[Byte](sc.comps.length.toByte)
      for (c <- sc.comps) {
        val tbl = if (c == 0) 0 else if (sc.comps.length > 1) 1 else 0
        val tdta = if (sc.ss == 0) tbl << 4 else tbl
        hdr += (c + 1).toByte; hdr += tdta.toByte
      }
      hdr += sc.ss.toByte; hdr += sc.se.toByte
      hdr += ((sc.ah << 4) | sc.al).toByte
      seg(out, 0xda, hdr.toArray)
      // pass 2: emit
      val bw = new BitWriter(out)
      runScan(sc, new EmitSink(bw, codes))
      bw.flush()
    }
    out += 0xff.toByte; out += 0xd9.toByte // EOI
    out.toArray
  }

  // ------------------------------------------------------------ decoder

  /** Per-length canonical decode tables (T.81 F.2.2.3). */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Byte]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.bit()
        len += 1
      }
      require(maxCode(len) >= 0 && code <= maxCode(len),
        "jpeg: invalid Huffman code")
      vals(valPtr(len) + code - minCode(len)) & 0xff
    }
  }

  /** Entropy-segment bit reader: removes stuffed 0x00 after 0xFF and
    * stops at any non-RST marker; RSTn is consumed by [[resync]].
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "jpeg: truncated entropy data")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val next = if (pos < data.length) data(pos) & 0xff else -1
          require(next == 0x00, s"jpeg: marker 0xff$next%02x inside entropy data")
          pos += 1
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receiveExtend(sz: Int): Int = {
      if (sz == 0) return 0
      var v = 0
      var i = 0
      while (i < sz) { v = (v << 1) | bit(); i += 1 }
      if (v < (1 << (sz - 1))) v - (1 << sz) + 1 else v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def resync(): Unit = {
      nbits = 0
      require(pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        ((data(pos + 1) & 0xff) & 0xf8) == 0xd0, "jpeg: expected RST marker")
      pos += 2
    }
  }

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, qId: Int)

  /** Decoded image: top-down RGB24 rows. */
  final case class Decoded(width: Int, height: Int, rows: Vector[Array[Byte]])

  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "jpeg: missing SOI")
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffDecoder](4)
    val acTables = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var progressive = false
    // persistent RAW (unquantized) coefficient store, one 64-int array
    // per block per component, raster over the padded MCU block grid —
    // progressive scans accumulate into it; reconstruction dequantizes
    // at the end. Baseline decodes through the same store.
    var store: Array[Array[Array[Int]]] = null
    var blocksW: Array[Int] = null
    var blocksH: Array[Int] = null
    var mcusX = 0; var mcusY = 0
    var sawScan = false

    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    def onSof(prog: Boolean): Unit = {
      require(pos + u16(pos) <= bytes.length, "jpeg: truncated SOF")
      val n = bytes(pos + 7) & 0xff
      require((bytes(pos + 2) & 0xff) == 8, "jpeg: 8-bit precision only")
      h = u16(pos + 3); w = u16(pos + 5)
      progressive = prog
      comps = Array.tabulate(n) { i =>
        val o = pos + 8 + i * 3
        Component(bytes(o) & 0xff, (bytes(o + 1) & 0xff) >> 4,
          bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
      }
      require(comps.forall(c => c.hSamp >= 1 && c.hSamp <= 2 &&
        c.vSamp >= 1 && c.vSamp <= 2), "jpeg: sampling factors 1-2 only")
      val hMax = comps.map(_.hSamp).max
      val vMax = comps.map(_.vSamp).max
      mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      blocksW = comps.map(c => mcusX * c.hSamp)
      blocksH = comps.map(c => mcusY * c.vSamp)
      store = comps.indices.map(i =>
        Array.fill(blocksW(i) * blocksH(i))(new Array[Int](64))).toArray
      pos += u16(pos)
    }

    /** Decode one scan's entropy data; returns the position just past
      * it (at the next marker). Implements T.81 F.2 (sequential) and
      * G.2 (progressive DC/AC first/refine with EOB runs).
      */
    def decodeScan(): Int = {
      val n = bytes(pos + 2) & 0xff
      val scanComps = Array.tabulate(n) { i =>
        val o = pos + 3 + i * 2
        val cid = bytes(o) & 0xff
        val ci = comps.indexWhere(_.id == cid)
        require(ci >= 0, s"jpeg: scan names unknown component $cid")
        (ci, (bytes(o + 1) & 0xff) >> 4, bytes(o + 1) & 0x0f)
      }
      val o2 = pos + 3 + n * 2
      val ss = bytes(o2) & 0xff
      val se = bytes(o2 + 1) & 0xff
      val ah = (bytes(o2 + 2) & 0xff) >> 4
      val al = bytes(o2 + 2) & 0x0f
      if (progressive) {
        require(ss <= 63 && se <= 63 && (if (ss == 0) se == 0 else se >= ss),
          s"jpeg: invalid progressive spectral band $ss..$se")
        require(ss == 0 || n == 1, "jpeg: progressive AC scans are single-component")
      } else require(ss == 0 && se == 63 && ah == 0 && al == 0,
        "jpeg: baseline scan must cover the full spectrum")

      val br = new BitReader(bytes, pos + u16(pos))
      val dcPred = new Array[Int](comps.length)
      var eobrun = 0
      var mcuCount = 0

      def restartIfDue(): Unit =
        if (restartInterval > 0 && mcuCount > 0 &&
            mcuCount % restartInterval == 0) {
          br.resync()
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }

      def readBits(nb: Int): Int = {
        var v = 0; var i = 0
        while (i < nb) { v = (v << 1) | br.bit(); i += 1 }
        v
      }

      // ---- per-block decoders into the raw store
      def fullBlock(ci: Int, dcId: Int, acId: Int, bi: Int): Unit = {
        val cf = store(ci)(bi)
        val t = dcTables(dcId).decode(br)
        dcPred(ci) += br.receiveExtend(t)
        cf(0) = dcPred(ci)
        var k = 1
        while (k < 64) {
          val rs = acTables(acId).decode(br)
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else k = 64 // EOB
          } else {
            k += r
            require(k < 64, "jpeg: AC index overflow")
            cf(Zigzag(k)) = br.receiveExtend(s)
            k += 1
          }
        }
      }
      def dcFirst(ci: Int, dcId: Int, bi: Int): Unit = {
        val t = dcTables(dcId).decode(br)
        dcPred(ci) += br.receiveExtend(t)
        store(ci)(bi)(0) = dcPred(ci) << al
      }
      def dcRefine(ci: Int, bi: Int): Unit =
        if (br.bit() == 1) store(ci)(bi)(0) |= (1 << al)
      def acFirst(ci: Int, acId: Int, bi: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        val cf = store(ci)(bi)
        var k = ss
        while (k <= se) {
          val rs = acTables(acId).decode(br)
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += readBits(r)
              k = 64 // end of block
            }
          } else {
            k += r
            require(k <= se, "jpeg: AC index past spectral band")
            cf(Zigzag(k)) = br.receiveExtend(s) << al
            k += 1
          }
        }
      }
      def acRefine(ci: Int, acId: Int, bi: Int): Unit = {
        val cf = store(ci)(bi)
        val p1 = 1 << al
        val m1 = -1 << al
        def correct(z: Int): Unit =
          if (br.bit() == 1 && (cf(z) & p1) == 0)
            cf(z) += (if (cf(z) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (!done && k <= se) {
            val rs = acTables(acId).decode(br)
            var r = rs >> 4
            val s = rs & 0x0f
            var newval = 0
            if (s == 0) {
              if (r != 15) { // EOBn: run of r-coded blocks ends here
                eobrun = 1 << r
                if (r > 0) eobrun += readBits(r)
                done = true
              } // r == 15: ZRL — skip 16 zero-history coefs below
            } else {
              require(s == 1, "jpeg: refinement scan magnitude must be 1")
              newval = if (br.bit() == 1) p1 else m1
            }
            if (!done) {
              var placed = false
              while (!placed && k <= se) {
                val z = Zigzag(k)
                if (cf(z) != 0) correct(z)
                else if (r == 0) {
                  if (newval != 0) cf(z) = newval
                  placed = true
                } else r -= 1
                k += 1
              }
              // ZRL with trailing zeros short of 16 simply exhausts the
              // band (placed stays false) — valid per G.2
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) { // correction bits to the band end
            val z = Zigzag(k)
            if (cf(z) != 0) correct(z)
            k += 1
          }
          eobrun -= 1
        }
      }

      if (scanComps.length > 1) {
        // interleaved MCU walk (multi-component scans: baseline full
        // blocks, or progressive DC). Single-component scans — BASELINE
        // INCLUDED (ADVICE r14: a non-interleaved sequential scan of a
        // subsampled component walks the component's own raster grid
        // and counts one restart-MCU per block, T.81 A.2.2) — take the
        // component-raster branch below.
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            restartIfDue()
            scanComps.foreach { case (ci, dcId, acId) =>
              val c = comps(ci)
              var v = 0
              while (v < c.vSamp) {
                var hh = 0
                while (hh < c.hSamp) {
                  val bi = (my * c.vSamp + v) * blocksW(ci) + mx * c.hSamp + hh
                  if (!progressive) fullBlock(ci, dcId, acId, bi)
                  else if (ah == 0) dcFirst(ci, dcId, bi)
                  else dcRefine(ci, bi)
                  hh += 1
                }
                v += 1
              }
            }
            mcuCount += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // single-component scan: blocks of the COMPONENT's own grid in
        // raster order (T.81 A.2.2 — ceil(comp dims / 8), NOT the
        // padded MCU grid), one block per restart-counted MCU
        val (ci, dcId, acId) = scanComps(0)
        val c = comps(ci)
        val hMax = comps.map(_.hSamp).max
        val vMax = comps.map(_.vSamp).max
        val cw = (w * c.hSamp + hMax - 1) / hMax
        val ch = (h * c.vSamp + vMax - 1) / vMax
        val bw = (cw + 7) / 8
        val bh = (ch + 7) / 8
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            restartIfDue()
            val bi = by * blocksW(ci) + bx
            if (!progressive) fullBlock(ci, dcId, acId, bi)
            else if (ss == 0 && ah == 0) dcFirst(ci, dcId, bi)
            else if (ss == 0) dcRefine(ci, bi)
            else if (ah == 0) acFirst(ci, acId, bi)
            else acRefine(ci, acId, bi)
            mcuCount += 1
            bx += 1
          }
          by += 1
        }
      }
      br.pos
    }

    var done = false
    while (!done) {
      require(pos + 1 < bytes.length, "jpeg: truncated stream")
      require((bytes(pos) & 0xff) == 0xff, "jpeg: expected marker")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xdb => // DQT, possibly several tables
          val end = pos + u16(pos)
          require(end <= bytes.length, "jpeg: truncated DQT")
          var p = pos + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "jpeg: only 8-bit quant tables supported")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
            qTables(tq) = t
            p += 65
          }
          pos = end
        case 0xc4 => // DHT, possibly several tables (progressive streams
          // redefine table slots between scans)
          val end = pos + u16(pos)
          require(end <= bytes.length, "jpeg: truncated DHT")
          var p = pos + 2
          while (p < end) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            val tbits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) { tbits(i) = bytes(p + i) & 0xff; total += tbits(i); i += 1 }
            val tvals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
            val dec = new HuffDecoder(tbits, tvals)
            if (tc == 0) dcTables(th) = dec else acTables(th) = dec
            p += 17 + total
          }
          pos = end
        case 0xc0 | 0xc1 => onSof(prog = false) // baseline / ext. sequential
        case 0xc2 => onSof(prog = true) // progressive
        case 0xdd => restartInterval = u16(pos + 2); pos += u16(pos)
        case 0xda =>
          require(comps != null, "jpeg: SOS before SOF")
          pos = decodeScan()
          sawScan = true
        case 0xd9 =>
          require(sawScan, "jpeg: EOI before SOS")
          done = true
        case _ => pos += u16(pos) // APPn / COM / anything skippable
      }
    }

    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    // per-component padded planes at native (subsampled) resolution
    val planeW = comps.map(c => mcusX * 8 * c.hSamp)
    val planeH = comps.map(c => mcusY * 8 * c.vSamp)
    val planes = comps.indices.map(i => new Array[Int](planeW(i) * planeH(i))).toArray

    // reconstruction: dequantize the raw store + IDCT (float,
    // floor(x+0.5) rounding, clamp) into the planes — identical
    // arithmetic for baseline and progressive
    val coefs = new Array[Int](64)
    for (ci <- comps.indices) {
      val q = qTables(comps(ci).qId)
      var bi = 0
      while (bi < store(ci).length) {
        val raw = store(ci)(bi)
        var i = 0
        while (i < 64) { coefs(i) = raw(i) * q(i); i += 1 }
        val bx = bi % blocksW(ci)
        val by = bi / blocksW(ci)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var s2 = 0.0
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                val c = coefs(v * 8 + u)
                if (c != 0) {
                  val cu = if (u == 0) InvSqrt2 else 1.0
                  val cv = if (v == 0) InvSqrt2 else 1.0
                  s2 += cu * cv * c * CosTable(x * 8 + u) * CosTable(y * 8 + v)
                }
                v += 1
              }
              u += 1
            }
            val value = math.floor(0.25 * s2 + 128.0 + 0.5).toInt
            val clamped = if (value < 0) 0 else if (value > 255) 255 else value
            planes(ci)((by * 8 + y) * planeW(ci) + bx * 8 + x) = clamped
            x += 1
          }
          y += 1
        }
        bi += 1
      }
    }

    // upsample + color-convert, cropped to the declared dimensions.
    // The YCbCr→RGB chain is ONE fixed IEEE order (left-associated,
    // floor(x + 0.5)) so the DuckDB oracle replays it bit-for-bit.
    val rows = Vector.newBuilder[Array[Byte]]
    var y = 0
    while (y < h) {
      val row = new Array[Byte](w * 3)
      var x = 0
      while (x < w) {
        if (comps.length == 1) {
          val g = planes(0)(y * planeW(0) + x).toByte
          row(x * 3) = g; row(x * 3 + 1) = g; row(x * 3 + 2) = g
        } else {
          def sample(ci: Int): Int = {
            val sx = x * comps(ci).hSamp / hMax
            val sy = y * comps(ci).vSamp / vMax
            planes(ci)(sy * planeW(ci) + sx)
          }
          val yv = sample(0); val cb = sample(1); val cr = sample(2)
          def clamp(d: Double): Byte = {
            val i = math.floor(d + 0.5).toInt
            (if (i < 0) 0 else if (i > 255) 255 else i).toByte
          }
          row(x * 3) = clamp(yv + 1.402 * (cr - 128))
          row(x * 3 + 1) = clamp(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
          row(x * 3 + 2) = clamp(yv + 1.772 * (cb - 128))
        }
        x += 1
      }
      rows += row
      y += 1
    }
    Decoded(w, h, rows.result())
  }

  /** [[Multimodal.Decoder]] over baseline JPEG payloads: frames are
    * top-down pixel rows, 3 bytes/pixel RGB (the Bmp/Png RowDecoder
    * contract — all three real image decoders feed the same
    * [[Multimodal.decodeRgbReadout]]).
    */
  final case class RowDecoder() extends Multimodal.Decoder {
    def frameStride: Int = 0
    def frameLen: Int = 0
    def sampleFrames(payload: Array[Byte]): Vector[Array[Byte]] =
      decode(payload).rows
  }
}
