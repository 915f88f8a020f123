package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.ops.Chunker

/** Chunker invariants (SURVEY.md §5.2 item 5): size bound, overlap,
  * reconstruction; reference contract size=1500/overlap=200
  * (app/main.py:85-86). Property-style via seeded generators (the
  * scalatest/scalacheck bridge isn't in the offline cache).
  */
class ChunkerSpec extends AnyFunSuite {

  private def randomTexts(n: Int): Seq[String] = {
    val rnd = new Random(42)
    val alphabet = ('a' to 'z') :+ ' ' :+ '\n'
    (0 until n).map { _ =>
      val len = rnd.nextInt(4000)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }
  }

  test("fixedStride: empty and short texts yield one chunk") {
    assert(Chunker.fixedStride("", 100, 20) == Vector(""))
    assert(Chunker.fixedStride("abc", 100, 20) == Vector("abc"))
  }

  test("fixedStride: exact contract on a known string") {
    val text = "a" * 250
    val chunks = Chunker.fixedStride(text, 100, 20)
    // stride 80: [0,100) [80,180) [160,250)
    assert(chunks.map(_.length) == Vector(100, 100, 90))
  }

  test("fixedStride properties: size bound, overlap, reconstruction") {
    for (text <- randomTexts(200)) {
      val size = 100; val overlap = 20; val stride = size - overlap
      val chunks = Chunker.fixedStride(text, size, overlap)
      assert(chunks.forall(_.length <= size))
      chunks.sliding(2).foreach {
        case Vector(a, b) if a.length == size =>
          assert(a.takeRight(overlap) == b.take(math.min(overlap, b.length)))
        case _ =>
      }
      val rebuilt = chunks.head + chunks.tail.map(_.drop(overlap)).mkString
      assert(rebuilt == text)
      assert(chunks.zipWithIndex.forall { case (c, i) =>
        text.slice(i * stride, i * stride + c.length) == c
      })
    }
  }

  test("recursive: chunks respect size bound, are substrings, reference config accepted") {
    for (text <- randomTexts(100)) {
      val chunks = Chunker.recursive(text, 100, 20)
      assert(chunks.forall(_.length <= 100))
      if (text.nonEmpty) {
        assert(chunks.nonEmpty)
        assert(chunks.forall(text.contains(_)))
      }
    }
    // the reference's exact configuration (app/main.py:85-86)
    val big = randomTexts(1).head * 5
    val refChunks = Chunker.recursive(big, 1500, 200)
    assert(refChunks.forall(_.length <= 1500))
  }

  test("recursive prefers paragraph boundaries") {
    val text = ("para one words here. " * 3 + "\n\n") * 5
    val chunks = Chunker.recursive(text, 80, 10)
    assert(chunks.forall(_.length <= 80))
    assert(chunks.nonEmpty)
  }
}
