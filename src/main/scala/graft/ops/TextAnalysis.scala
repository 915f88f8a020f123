package graft.ops

/** Portable text-hashing / shingling expression builders.
  *
  * Everything here must produce *bit-identical* results in Spark and in
  * the DuckDB oracle, so hashing is plain 64-bit polynomial arithmetic
  * over character codes — NOT engine hash functions (Spark `hash()` is
  * Murmur3(seed=42), DuckDB `hash()` is a different function entirely).
  *
  * Both builders emit the same fold: h ← (h·31 + ascii(c)) mod P over
  * the characters in order. Spark's `aggregate` and DuckDB's
  * `list_reduce` are both sequential left folds, so the result is
  * deterministic and engine-independent. P = 1e9+7 keeps every
  * intermediate (< 31·P + 127 ≈ 3.1e10, and a·h < 1e9·1e9 = 1e18) inside
  * signed 64-bit.
  *
  * Scale note: these run inside whole-stage codegen as HOF expressions —
  * no UDF, no serialization boundary — so the 100 TB path is the same
  * generated loop per row with no dictionary build or driver round-trip
  * (a global word→id dictionary would be an extra shuffle + broadcast).
  */
object TextAnalysis {
  /** Modulus for all polynomial/permutation hashing. */
  val P = 1000000007L

  /** Spark SQL: polynomial hash of a string expression. */
  def hashSpark(e: String): String =
    s"aggregate(split($e, ''), CAST(0 AS BIGINT), (h, c) -> (h * 31 + ascii(c)) % $P)"

  /** DuckDB twin of [[hashSpark]]. */
  def hashDuck(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), (h, c) -> (h * 31 + c) % $P)"

  /** Spark SQL: sorted distinct word-n-gram shingle hashes over a
    * pre-bound `ws` (array<string> of words; every doc has ≥ n words —
    * testdata min is 10). Spark arrays are 0-indexed.
    */
  def shinglesSpark(n: Int): String = {
    val gram = (0 until n).map(k => s"ws[i + $k]")
      .mkString("concat_ws(' ', ", ", ", ")")
    s"array_sort(array_distinct(transform(sequence(0, size(ws) - $n), i -> ${hashSpark(gram)})))"
  }

  /** DuckDB twin of [[shinglesSpark]] (lists are 1-indexed). */
  def shinglesDuck(n: Int): String = {
    val gram = (0 until n).map(k => s"ws[i + $k]")
      .mkString("concat_ws(' ', ", ", ", ")")
    s"list_sort(list_distinct(list_transform(generate_series(1, len(ws) - ${n - 1}), i -> ${hashDuck(gram)})))"
  }
}
