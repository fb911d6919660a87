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
    * document has fewer than n tokens.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(0))),
      i => concat_ws(" ", slice(t, i, lit(n)))
    )
  }

  /** Distinct shingle set (the unit of Jaccard similarity). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(wordShingles(text, n))

  /** 64-bit hashes of the distinct shingles — the MinHash input. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingleSet(text, n), s => xxhash64(s))
}
