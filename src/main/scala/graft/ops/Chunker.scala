package graft.ops

import scala.annotation.tailrec
import scala.collection.mutable.ArrayBuffer

/** Deterministic re-implementation of the reference's text chunking
  * contract (app/main.py:84-88: RecursiveCharacterTextSplitter,
  * chunk_size=1500, chunk_overlap=200 — the algorithm itself lives in
  * langchain, so this is a documented clean-room equivalent, SURVEY.md
  * §7.4 item 4).
  *
  * Two variants:
  *  - [[fixedStride]]: the oracle-checkable contract (size S, overlap O
  *    → stride S−O) used by `q_text_chunk`;
  *  - [[recursive]]: separator-aware recursive splitting ("\n\n", "\n",
  *    " ", "") honoring the same size/overlap contract, scalatest- and
  *    scalacheck-covered (not oracle-graded: langchain's exact merge
  *    heuristics are not a public spec worth bit-matching).
  */
object Chunker {
  val DefaultSize = 1500
  val DefaultOverlap = 200

  /** Fixed-stride chunking: chunk i covers [i·(S−O), i·(S−O)+S). */
  def fixedStride(text: String, size: Int = DefaultSize,
                  overlap: Int = DefaultOverlap): Vector[String] = {
    require(size > overlap && overlap >= 0, s"bad chunk config $size/$overlap")
    val stride = size - overlap
    val n = math.max(1, math.ceil((text.length - overlap).toDouble / stride).toInt)
    (0 until n).map(i => text.slice(i * stride, i * stride + size)).toVector
  }

  private val Separators = List("\n\n", "\n", " ", "")

  /** Recursive separator-aware splitting: split on the coarsest
    * separator that yields pieces ≤ size (recursing into oversized
    * pieces with finer separators), then greedily merge adjacent pieces
    * up to `size` chars, carrying `overlap` chars of suffix context
    * into the next chunk.
    */
  def recursive(text: String, size: Int = DefaultSize,
                overlap: Int = DefaultOverlap): Vector[String] = {
    require(size > overlap && overlap >= 0, s"bad chunk config $size/$overlap")
    if (text.isEmpty) Vector.empty
    else merge(splitRec(text, size, Separators), size, overlap)
  }

  @tailrec
  private def pickSep(text: String, seps: List[String]): String = seps match {
    case s :: rest =>
      if (s.isEmpty || text.contains(s)) s else pickSep(text, rest)
    case Nil => ""
  }

  private def splitRec(text: String, size: Int, seps: List[String]): Vector[String] = {
    if (text.length <= size) return Vector(text)
    val sep = pickSep(text, seps)
    val finer = seps.dropWhile(_ != sep).drop(1)
    val parts: Vector[String] =
      if (sep.isEmpty) text.grouped(size).toVector
      else {
        val raw = text.split(java.util.regex.Pattern.quote(sep), -1).toVector
        // keep the separator attached to the piece on its left
        raw.zipWithIndex
          .map { case (p, i) => if (i < raw.length - 1) p + sep else p }
          .filter(_.nonEmpty)
      }
    parts.flatMap { p =>
      if (p.length <= size) Vector(p) else splitRec(p, size, finer)
    }
  }

  private def merge(pieces: Vector[String], size: Int, overlap: Int): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    for (p <- pieces) {
      if (cur.nonEmpty && cur.length + p.length > size) {
        out += cur.toString
        // carry at most `overlap` chars of context — but never so much
        // that overlap + next piece would itself exceed the size bound
        val keep = cur.toString.takeRight(math.min(overlap, math.max(size - p.length, 0)))
        cur.clear(); cur ++= keep
      }
      cur ++= p
    }
    if (cur.nonEmpty) out += cur.toString
    out.toVector
  }
}
