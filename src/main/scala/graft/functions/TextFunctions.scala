package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives over string columns — built-in functions only, so the
  * whole pipeline stays inside whole-stage codegen.
  */
object TextFunctions {

  /** Whitespace tokenization (regex `\s+` on the trimmed text). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles: ["a b c", "b c d", ...]; empty array when the
    * document has fewer than n tokens. The short-doc case needs the
    * explicit `when`: `sequence(1, 0)` generates a DESCENDING [1, 0],
    * not an empty array, and `slice(t, 0, n)` then throws at runtime.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))
      ))
  }

  /** Distinct shingle set (the unit of Jaccard similarity). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(wordShingles(text, n))

  /** 64-bit hashes of the distinct shingles — the MinHash input. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingleSet(text, n), s => xxhash64(s))
}
