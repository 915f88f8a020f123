package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Jpeg, Multimodal, Png}

/** Pixel-true perceptual dedup (r15, VERDICT r14 task #2): the dHash
  * signature must be a function of decoded IMAGE CONTENT, not of the
  * encoded byte stream. The decisive twin — the one the retired
  * byte-window stub could never catch — is ONE image encoded once as
  * PNG (lossless deflate) and once as JPEG (lossy DCT): the two byte
  * streams share almost nothing, but the decoded pixels are near-
  * identical, so the content hashes must land in the same Hamming-≤2
  * bucket (and share a band key, i.e. the banded pipeline would
  * actually pair them).
  */
class PhashPixelSpec extends AnyFunSuite {

  // a 48×32 grayscale gradient with strong horizontal slope (Δ4/px →
  // ~21 between adjacent dHash grid cells), so JPEG's small roundtrip
  // error (all-ones quant tables: ±2) can never flip a gradient sign.
  // Max value 47*4 + 31 = 219 < 256 — no clipping nonlinearity.
  private def gray(x: Int, y: Int): Int = x * 4 + y

  private def sigOf(rows: Vector[Array[Byte]]): (Long, Long) =
    Multimodal.dhashSig(Multimodal.dhashGrid(rows))

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  private def bandKeys(sig: (Long, Long)): Set[Long] =
    ((0 until 4).map(g => g * 256L + ((sig._1 >> (g * 8)) & 255L)) ++
      (0 until 4).map(g => (g + 4) * 256L + ((sig._2 >> (g * 8)) & 255L))).toSet

  test("same image as PNG and as JPEG: Hamming <= 2 and a shared band") {
    val pngBytes = Png.encodeRgb8(48, 32, (x, y) => {
      val v = gray(x, y); (v, v, v)
    })
    // grayscale JPEG plant: Y = the gradient, chroma constant 128
    // (Cb=Cr=128 ⇒ R=G=B=Y after color conversion)
    val yPlane = Array.tabulate(48 * 32)(i => gray(i % 48, i / 48))
    val flat = Array.fill(24 * 16)(128)
    val jpgBytes = Jpeg.encode420(48, 32, yPlane, flat, flat,
      restartInterval = 2)
    val sigPng = sigOf(Png.RowDecoder().sampleFrames(pngBytes))
    val sigJpg = sigOf(Jpeg.RowDecoder().sampleFrames(jpgBytes))
    val h = hamming(sigPng, sigJpg)
    assert(h <= 2, s"PNG/JPEG twin drifted to Hamming $h")
    assert(bandKeys(sigPng).intersect(bandKeys(sigJpg)).nonEmpty,
      "the banded candidate join must surface the cross-codec twin")
    // the stub this replaced hashed ENCODED bytes; pin that that path
    // really is blind to the twin (documents why the upgrade matters):
    // byte-window "pixels" of the two encodings are unrelated streams
    val stub = Multimodal.StubDecoder()
    def stubGrid(payload: Array[Byte]): Array[Int] =
      Array.tabulate(72)(i => payload(i % payload.length) & 0xff)
    val stubPng = Multimodal.dhashSig(stubGrid(pngBytes))
    val stubJpg = Multimodal.dhashSig(stubGrid(jpgBytes))
    assert(stub != null && hamming(stubPng, stubJpg) > 6,
      "byte-stream hashing should NOT see these as twins — if it does, " +
        "the pixel-true upgrade lost its motivating case")
  }

  test("PNG decode of the 9x8 planted grid is exactly the closed form") {
    // the q_dedup_phash contract: 9×8 R=G=B images make luminance and
    // the box resize exact, so grid == the oracle's closed-form pixels
    val id = 4242L
    def pxOf(i: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}_$i".getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 255L).toInt
    }
    val png = Png.encodeRgb8(9, 8, (x, y) => {
      val v = pxOf(y * 9 + x + 1)
      (v, v, v)
    })
    val grid = Multimodal.dhashGrid(Png.RowDecoder().sampleFrames(png))
    val expect = Array.tabulate(72)(i => pxOf(i + 1))
    assert(grid.toSeq === expect.toSeq)
  }

  test("unrelated images stay far apart; the +1 perturbed twin stays close") {
    val a = Png.encodeRgb8(48, 32, (x, y) => {
      val v = gray(x, y); (v, v, v)
    })
    // reversed gradient: all 56 comparable gradient signs flip
    val b = Png.encodeRgb8(48, 32, (x, y) => {
      val v = 219 - gray(x, y); (v, v, v)
    })
    val dec = Png.RowDecoder()
    assert(hamming(sigOf(dec.sampleFrames(a)), sigOf(dec.sampleFrames(b))) > 6)
    val aTweak = Png.encodeRgb8(48, 32, (x, y) => {
      val v = gray(x, y) + (if ((x * 5 + y) % 9 == 0) 1 else 0)
      (v, v, v)
    })
    assert(hamming(sigOf(dec.sampleFrames(a)),
      sigOf(dec.sampleFrames(aTweak))) <= 2)
  }
}
