package graft

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{ScoredCand, ShingleHashes, SketchExprs, TopKByScore, VectorExprs}
import graft.ops.Chunker

/** Property-based invariants (SURVEY.md §5.2 item 5) — pure-JVM checks
  * of the algorithmic kernels, run by sbt's native ScalaCheck support
  * (no Spark session; the Spark-integration side is covered by the
  * equivalence specs).
  */
object GraftProperties extends Properties("graft") {

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 800)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.const('\n')))
  } yield cs.mkString

  private val configGen: Gen[(Int, Int)] = for {
    size <- Gen.chooseNum(2, 200)
    overlap <- Gen.chooseNum(0, size - 1)
  } yield (size, overlap)

  property("fixedStride: every chunk <= size; first chunk starts text") =
    forAll(textGen, configGen) { (t, cfg) =>
      val (size, overlap) = cfg
      val chunks = Chunker.fixedStride(t, size, overlap)
      chunks.forall(_.length <= size) &&
        (t.isEmpty || chunks.head == t.take(size))
    }

  property("fixedStride: stride concatenation reconstructs the input") =
    forAll(textGen, configGen) { (t, cfg) =>
      val (size, overlap) = cfg
      val stride = size - overlap
      val chunks = Chunker.fixedStride(t, size, overlap)
      val rebuilt = chunks.zipWithIndex
        .map { case (c, i) => if (i == chunks.length - 1) c else c.take(stride) }
        .mkString
      rebuilt == t || (t.isEmpty && rebuilt.isEmpty)
    }

  property("fixedStride: consecutive chunks overlap by `overlap` chars") =
    forAll(textGen, configGen) { (t, cfg) =>
      val (size, overlap) = cfg
      val stride = size - overlap
      val chunks = Chunker.fixedStride(t, size, overlap)
      chunks.sliding(2).forall {
        case Seq(a, b) =>
          // b starts `stride` after a: a's suffix beyond its first
          // `stride` chars must prefix b
          a.drop(stride) == b.take(math.max(a.length - stride, 0))
        case _ => true
      }
    }

  property("recursive: size bound and full coverage of non-space content") =
    forAll(textGen, configGen) { (t, cfg) =>
      val (size, overlap) = cfg
      val chunks = Chunker.recursive(t, size, overlap)
      chunks.forall(_.length <= size) &&
        chunks.mkString.replaceAll("\\s", "").contains(
          t.replaceAll("\\s", "").take(0)) && // vacuous guard for empty
        (t.replaceAll("\\s", "").isEmpty ||
          chunks.mkString.replaceAll("\\s", "").length >=
            t.replaceAll("\\s", "").length)
    }

  private val scoredGen: Gen[List[ScoredCand]] = Gen.listOf(for {
    id <- Gen.chooseNum(0L, 50L)
    score <- Gen.chooseNum(-5, 5).map(_ / 2.0) // coarse grid forces ties
  } yield ScoredCand(id, s"l$id", score))

  private def bruteTopK(xs: Seq[ScoredCand], k: Int): Seq[ScoredCand] =
    xs.sortBy(c => (-c.score, c.cand_id)).take(k)

  property("TopKByScore.reduce == brute-force sort.take(k)") =
    forAll(scoredGen, Gen.chooseNum(1, 8)) { (xs, k) =>
      val agg = new TopKByScore(k)
      xs.foldLeft(agg.zero)(agg.reduce) == bruteTopK(xs, k)
    }

  property("TopKByScore.merge of any split == global top-k") =
    forAll(scoredGen, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) { (xs, k, cut) =>
      val agg = new TopKByScore(k)
      val (a, b) = xs.splitAt(cut % (xs.length + 1))
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      merged == bruteTopK(xs, k)
    }

  private val sortedLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 100L)).map(_.distinct.sorted.toArray)

  property("intersectCount == set intersection size") =
    forAll(sortedLongs, sortedLongs) { (a, b) =>
      VectorExprs.intersectCount(
        UnsafeArrayData.fromPrimitiveArray(a),
        UnsafeArrayData.fromPrimitiveArray(b)) ==
        a.toSet.intersect(b.toSet).size.toLong
    }

  private val wordsGen: Gen[Array[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
      .map(_.toArray)

  /** Plain-Scala reference of the shingle-hash fold. */
  private def refShingles(ws: Array[String], n: Int): Array[Long] = {
    val P = 1000000007L
    (0 to ws.length - n).map { i =>
      ws.slice(i, i + n).mkString(" ")
        .foldLeft(0L)((h, c) => (h * 31 + c) % P)
    }.distinct.sorted.toArray
  }

  property("ShingleHashes.compute == reference fold (sorted distinct)") =
    forAll(wordsGen, Gen.chooseNum(1, 4)) { (ws, n) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        ws.map(org.apache.spark.unsafe.types.UTF8String.fromString))
      val got = ShingleHashes.compute(arr, n).toLongArray()
      got.sameElements(refShingles(ws, n))
    }

  private val shingleSetGen: Gen[Array[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, SketchExprs.P - 1))
      .map(_.distinct.sorted.toArray)

  property("MinHashSigs == per-permutation reference fold") =
    forAll(shingleSetGen) { sh =>
      val P = SketchExprs.P
      val expected = (0 until 16).map { j =>
        val aj = ((j + 1L) * 2654435761L) % P
        sh.map(h => (h * aj + j * 40503L) % P).min
      }
      SketchExprs.minhash(
        UnsafeArrayData.fromPrimitiveArray(sh), 16).toLongArray()
        .sameElements(expected)
    }

  property("SimHashSig == per-bit reference fold") =
    forAll(shingleSetGen) { sh =>
      val P = SketchExprs.P
      val expected = (0 until 32).foldLeft(0L) { (acc, j) =>
        val s = sh.map(h =>
          if (((h * (2L * j + 3) + j) % P) % 2 == 1) 1L else -1L).sum
        acc * 2 + (if (s > 0) 1L else 0L)
      }
      SketchExprs.simhash(UnsafeArrayData.fromPrimitiveArray(sh)) == expected
    }

  private val pdfTextGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 400)
    cs <- Gen.listOfN(n, Gen.frequency(
      12 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.const('('), 1 -> Gen.const(')'), 1 -> Gen.const('\\'),
      1 -> Gen.const('\n'), 1 -> Gen.const('\t'),
      1 -> Gen.choose(' ', '~')))
  } yield cs.mkString

  property("PdfPages: synthesize → extract round-trips arbitrary page texts") =
    forAll(Gen.listOfN(3, pdfTextGen)) { texts =>
      val pages = graft.sources.PdfPages.extract(
        "gen.pdf", graft.sources.PdfPages.synthesize(texts))
      pages.map(_.text) == texts && pages.map(_.page_index) == texts.indices
    }

  property("kNN invariant: top-1 distance <= every other distance") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(4, Gen.chooseNum(-100, 100)))) { vss =>
      val probe = Array(1.0, -2.0, 3.0, 0.5)
      def l2(v: List[Int]): Double =
        v.zip(probe).map { case (x, p) => (x - p) * (x - p) }.sum
      val best = vss.map(l2).min
      vss.forall(v => l2(v) >= best)
    }
}
