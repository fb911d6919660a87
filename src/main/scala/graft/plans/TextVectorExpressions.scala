package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text/vector kernels. The HOF formulations of these re-run
  * the tokenizer once PER SHINGLE (the lambda body contains the split),
  * making them O(tokens²) interpreted — these are O(tokens) JIT'd.
  * CodegenFallback is deliberate: the per-row work dominates, so the
  * lost fusion is noise (measured: shingle hashing 10s → <1s at sf0.1).
  */

/** Distinct hashes of word n-gram shingles of a text column.
  * Tokenization replicates `split(trim(text), "\\s+")` (space-only trim,
  * Java regex split) so set sizes agree with the SQL-level shingle sets.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // space-only trim, matching Spark's trim()
    var from = 0
    var to   = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    val tokens = ws.split(s.substring(from, to), -1)
    if (tokens.length < n) return new GenericArrayData(Array.emptyLongArray)

    val th = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val b = tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      th(i) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      i += 1
    }
    val m   = tokens.length - n + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = -3750763034362895579L // FNV offset basis
      var j = 0
      while (j < n) { h = (h ^ th(i + j)) * 1099511628211L; j += 1 }
      out(i) = h
      i += 1
    }
    // distinct via sort + dedup (the shingle SET is the similarity unit)
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Non-distinct per-token xxhash64 values (seed 42, bit-identical to
  * `transform(split(trim(text),"\\s+"), t => xxhash64(t))`) — the
  * SimHash input, where token multiplicity must be preserved.
  */
case class TokenHashes(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var from = 0
    var to   = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    val tokens = ws.split(s.substring(from, to), -1)
    val out    = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val b = tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(i) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** Jaccard similarity of two SORTED distinct long arrays (the
  * ShingleHashes output contract) by linear merge — O(n+m) with no
  * per-call hash sets, vs the interpreted array_intersect formulation
  * (measured 6.8s → sub-second for 622k pairs at sf0.1). Value is
  * |∩| / |∪| as an exact-int double division, identical to
  * size(intersect)/size(union).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  // real codegen (not CodegenFallback): this runs once per candidate
  // pair in the dedup verify filter, and a fallback here would break the
  // surrounding stage out of whole-stage codegen
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n     = ctx.freshName("n")
      val m     = ctx.freshName("m")
      val i     = ctx.freshName("i")
      val j     = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xv    = ctx.freshName("xv")
      val yv    = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $n && $j < $m) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($n == 0 && $m == 0)
         |  ? Double.NaN : (double) $inter / (double) ($n + $m - $inter);
       """.stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 && m == 0) return Double.NaN // 0/0, matches int division semantics
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter).toDouble
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

/** Intersection CARDINALITY of two SORTED distinct long arrays (the
  * ShingleHashes output contract) by the same linear merge as
  * [[SortedJaccard]]. Returned as a long so callers pick their own
  * normalization — |∩|/|A| is asymmetric CONTAINMENT (is A quoted
  * inside B?), which symmetric Jaccard structurally under-scores when
  * the container is much larger than the contained doc.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n     = ctx.freshName("n")
      val m     = ctx.freshName("m")
      val i     = ctx.freshName("i")
      val j     = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xv    = ctx.freshName("xv")
      val yv    = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0, $j = 0;
         |long $inter = 0L;
         |while ($i < $n && $j < $m) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

/** Full text profile in ONE pass over the string — every count the text
  * analysis family needs, so token stats, quality scoring and language ID
  * stop re-tokenizing / re-scanning per feature (the old shape evaluated
  * `split(trim(text))` up to 3× via projection collapse plus 3-4 regexp
  * passes per row). Output layout (all longs):
  *
  *  - 0: token count       — replicates `size(split(trim(text),"\\s+"))`
  *  - 1: distinct tokens   — replicates `size(array_distinct(...))`
  *                           (exact string equality, case-sensitive)
  *  - 2: code points       — replicates `length(text)` (untrimmed)
  *  - 3: chars in [A-Za-z ]     (the alpha-ratio numerator)
  *  - 4: chars in [0-9]
  *  - 5: chars in [.,;:!?]
  *  - 6: chars in [一-鿿]  (CJK, the zh-detection numerator)
  *  - 7+i: tokens whose lowercase form is in `sets(i)`
  *
  * Ratios derived from these counts are bit-identical to the HOF/regexp
  * formulations: same integer numerators and denominators, same double
  * division.
  */
case class TextProfile(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val ws = java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val lookup: Array[java.util.HashSet[String]] =
    sets.map { s =>
      val h = new java.util.HashSet[String]()
      s.foreach(w => h.add(w.toLowerCase(java.util.Locale.ROOT)))
      h
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val s   = input.asInstanceOf[UTF8String].toString
    val out = new Array[Long](7 + lookup.length)

    // char-class counts over the FULL string by code point (length()
    // and regexp_replace() both operate on code points)
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      out(2) += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || cp == ' ') out(3) += 1
      else if (cp >= '0' && cp <= '9') out(4) += 1
      else if (cp == '.' || cp == ',' || cp == ';' || cp == ':' || cp == '!' || cp == '?') out(5) += 1
      else if (cp >= 0x4e00 && cp <= 0x9fff) out(6) += 1
      ci += Character.charCount(cp)
    }

    // token counts over the space-trimmed string (split(trim(text)))
    var from = 0
    var to   = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    val tokens = ws.split(s.substring(from, to), -1)
    out(0) = tokens.length.toLong
    val seen = new java.util.HashSet[String](math.max(16, tokens.length * 2))
    var i = 0
    while (i < tokens.length) {
      if (seen.add(tokens(i))) out(1) += 1
      val t = tokens(i).toLowerCase(java.util.Locale.ROOT)
      var j = 0
      while (j < lookup.length) {
        if (lookup(j).contains(t)) out(7 + j) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

/** Word n-gram duplication counts for MULTIPLE widths in ONE pass: for
  * each n in `ns`, the number of n-grams and the number of DISTINCT
  * n-grams — the numerators/denominators of the Gopher repetition
  * filters. The HOF formulation (`transform(sequence(...))` +
  * `array_distinct` per width, re-evaluated per reference by the
  * interpreted projection) measured ~36 s at sf0.1 where this kernel is
  * one tokenization and one hash-set sweep per width (sub-second).
  *
  * Output layout: [count(ns(0)), distinct(ns(0)), count(ns(1)), ...].
  * Distinctness is exact string equality of the space-joined gram —
  * identical to `array_distinct(concat_ws(" ", slice(...)))` and
  * DuckDB's `list_distinct(list_transform(...))`: tokens cannot contain
  * whitespace (they come from a `\s+` split), so the joined string is a
  * bijection of the token tuple.
  */
case class NGramProfile(child: Expression, ns: Seq[Int])
    extends UnaryExpression with CodegenFallback {
  require(ns.nonEmpty && ns.forall(_ >= 1), s"gram widths must be >= 1: $ns")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // same tokenization as TextProfile / split(trim(text), "\s+")
    var from = 0
    var to   = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    val tokens = ws.split(s.substring(from, to), -1)
    val T      = tokens.length

    val out = new Array[Long](2 * ns.length)
    var k = 0
    while (k < ns.length) {
      val n      = ns(k)
      val nGrams = math.max(0, T - n + 1)
      out(2 * k) = nGrams.toLong
      if (nGrams > 0) {
        if (n == 1) {
          val seen = new java.util.HashSet[String](math.max(16, T * 2))
          var i = 0
          var d = 0L
          while (i < T) { if (seen.add(tokens(i))) d += 1; i += 1 }
          out(2 * k + 1) = d
        } else {
          val seen = new java.util.HashSet[String](math.max(16, nGrams * 2))
          val sb   = new java.lang.StringBuilder
          var i = 0
          var d = 0L
          while (i < nGrams) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(tokens(i + j))
              j += 1
            }
            if (seen.add(sb.toString)) d += 1
            i += 1
          }
          out(2 * k + 1) = d
        }
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NGramProfile =
    copy(child = newChild)
}

/** Deflate compression ratio of the document's UTF-8 bytes —
  * compressed/raw, in (0, ~1.05]. The classic model-free redundancy
  * signal (Gopher §A1.1 uses it alongside the repetition rules):
  * templated boilerplate and repeated spans compress far below natural
  * prose (~0.4-0.7), while random identifiers/gibberish sit near or
  * above 1. Level is fixed (6) so the value is deterministic for a
  * given JDK's zlib. Empty input → 1.0 (nothing to compress).
  */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, /*nowrap=*/ true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](raw.length + 64)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Canonical text normalization for dedup keys and cross-corpus joins:
  * trim → collapse runs of whitespace to one space → lowercase
  * (Locale.ROOT) → Unicode NFC. Exact-dup detection keyed on raw bytes
  * misses the same sentence with "é" precomposed (U+00E9) vs decomposed
  * (e + U+0301), doubled spaces, or case drift — normalizing first makes
  * `md5(normalize_text(text))` the canonical content key.
  *
  * One pass, no regex engine: whitespace collapse and ASCII lowering run
  * in a single char scan; `Normalizer.normalize` is invoked only when the
  * scan saw a non-ASCII char (ASCII is NFC-closed), so the common case
  * never pays the ICU walk. Contract note: non-ASCII LOWERCASING uses
  * Java's full case mapping, which can differ from a simple per-codepoint
  * mapping for a handful of chars (e.g. U+0130); the DuckDB oracle gates
  * the ASCII corpus, the Unicode edge cases are spec-pinned.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any = {
    val s  = input.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length)
    var i        = 0
    var inWs     = false
    var sawStart = false
    var ascii    = true
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || Character.isWhitespace(c)) {
        inWs = true
      } else {
        if (inWs && sawStart) sb.append(' ')
        inWs = false
        sawStart = true
        if (c < 128) sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        else { ascii = false; sb.append(c) }
      }
      i += 1
    }
    var out = sb.toString
    if (!ascii) {
      out = out.toLowerCase(java.util.Locale.ROOT)
      if (!java.text.Normalizer.isNormalized(out, java.text.Normalizer.Form.NFC))
        out = java.text.Normalizer.normalize(out, java.text.Normalizer.Form.NFC)
    }
    UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Winnowing fingerprints (Schleimer et al., SIGMOD 2003) in one pass:
  * hash char k-grams (xxhash64 of the gram's UTF-8 bytes, seed 42 — the
  * same value `xxhash64(substr(text,i,k))` yields), slide a window of w
  * hashes keeping each window's minimum, emit the distinct minima sorted.
  * The HOF formulation allocates a slice PER WINDOW (O(n·w) interpreted
  * allocations); this is a single O(n·w) primitive loop with zero
  * allocation per window.
  */
case class WinnowingFingerprintHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val u     = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    // start byte offset of each code point (UTF-8 aware so grams are
    // character k-grams, matching substr semantics)
    val nBytes  = bytes.length
    val offsets = new Array[Int](nBytes + 1)
    var nChars  = 0
    var b       = 0
    while (b < nBytes) {
      offsets(nChars) = b
      val c = bytes(b) & 0xff
      b += (if (c < 0x80) 1 else if (c < 0xe0) 2 else if (c < 0xf0) 3 else 4)
      nChars += 1
    }
    offsets(nChars) = nBytes

    val nGrams = nChars - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val from = offsets(i)
      hashes(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, offsets(i + k) - from, 42L)
      i += 1
    }
    val nWin = nGrams - w + 1
    if (nWin <= 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = new Array[Long](nWin)
    i = 0
    while (i < nWin) {
      var m = hashes(i)
      var j = 1
      while (j < w) { val h = hashes(i + j); if (h < m) m = h; j += 1 }
      mins(i) = m
      i += 1
    }
    // distinct via sort + dedup (fingerprints are a SET)
    java.util.Arrays.sort(mins)
    var wd = 0
    i = 0
    while (i < nWin) {
      if (wd == 0 || mins(i) != mins(wd - 1)) { mins(wd) = mins(i); wd += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, wd))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprintHashes =
    copy(child = newChild)
}

/** LSH bucket ids of a vector in `tables` independent hyperplane tables,
  * all computed in one pass. `planes(t)(bit)` is a dim-length hyperplane.
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Int](planes.length)
    var t = 0
    while (t < planes.length) {
      val table  = planes(t)
      var bucket = 0
      var bit    = 0
      while (bit < table.length) {
        val plane = table(bit)
        var d     = 0.0
        var i     = 0
        val dim   = math.min(plane.length, vec.length)
        while (i < dim) { d += plane(i) * vec(i); i += 1 }
        if (d > 0) bucket |= (1 << bit)
        bit += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Per-needle occurrence counts of a fixed needle set by one
  * Aho-Corasick pass: `out(i)` = occurrences of `needles(i)` in the
  * text (all match positions, substring semantics — not tokens).
  * Totals and coverage derive with codegen'd HOFs from the ONE pass:
  * `aggregate(counts, sum)`, `size(filter(counts, c -> c > 0))`.
  *
  * The scale contract of contamination screening: the built-in
  * formulation is O(needles × length) per document (one `contains`/
  * `replace` scan per needle); the automaton is O(length + matches)
  * independent of needle count. The needle list is an expression
  * constant — serialized once per task binary, automaton rebuilt
  * lazily ONCE per executor JVM (transient lazy), never per row or
  * partition. Bounded contract: the per-document output vector is
  * needle-count-sized, so needle sets belong in the 10²–10⁵ range
  * (canary strings, benchmark digests, blocklists) — corpus-sized
  * needle sets are a join, not an expression.
  */
case class MultiPatternCounts(child: Expression, needles: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(needles.nonEmpty, "needle set must be non-empty")
  require(needles.forall(_.nonEmpty), "empty needles match everywhere")
  require(needles.distinct.size == needles.size, "duplicate needles double-count")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // goto as per-node char maps; fail + dict-suffix (output) links by BFS.
  // Built once per JVM that evaluates the expression (driver for
  // constant folding, each executor otherwise).
  @transient private lazy val automaton: AhoCorasick = AhoCorasick(needles)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(automaton.counts(s))
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
}

private[plans] final class AhoCorasick(
    gotoMaps: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    // needle index ending at this node, -1 if none
    hit: Array[Int],
    // nearest dict-suffix ancestor with a hit, -1 if none
    dict: Array[Int],
    nNeedles: Int) {

  /** One pass over `s`; O(|s| + matches) via dict-suffix links. */
  def counts(s: String): Array[Long] = {
    val out = new Array[Long](nNeedles)
    var node = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      var next = gotoMaps(node).get(c)
      while (next == null && node != 0) {
        node = fail(node)
        next = gotoMaps(node).get(c)
      }
      node = if (next == null) 0 else next.intValue()
      if (hit(node) >= 0) out(hit(node)) += 1L
      var d = dict(node)
      while (d >= 0) { out(hit(d)) += 1L; d = dict(d) }
      i += 1
    }
    out
  }
}

private[plans] object AhoCorasick {
  def apply(needles: Seq[String]): AhoCorasick = {
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val hit = scala.collection.mutable.ArrayBuffer(-1)
    needles.zipWithIndex.foreach { case (n, idx) =>
      var node = 0
      n.foreach { ch =>
        val c = Character.valueOf(ch)
        var next = gotoMaps(node).get(c)
        if (next == null) {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          hit += -1
          next = Integer.valueOf(gotoMaps.size - 1)
          gotoMaps(node).put(c, next)
        }
        node = next.intValue()
      }
      hit(node) = idx
    }
    val size = gotoMaps.size
    val fail = new Array[Int](size)
    val dict = new Array[Int](size)
    java.util.Arrays.fill(dict, -1)
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).values().forEach(v => queue.add(v))
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotoMaps(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && gotoMaps(f).get(c) == null) f = fail(f)
        val fNext = gotoMaps(f).get(c)
        fail(v) = if (fNext != null && fNext.intValue() != v.intValue())
          fNext.intValue() else 0
        dict(v) = if (hit(fail(v)) >= 0) fail(v) else dict(fail(v))
        queue.add(v)
      }
    }
    new AhoCorasick(gotoMaps.toArray, fail, hit.toArray, dict, needles.size)
  }
}

object TextVectorExpressions {
  def shingleHashes(text: Column, n: Int): Column =
    GraftShim.column(ShingleHashes(GraftShim.expression(text), n))

  def tokenHashes(text: Column): Column =
    GraftShim.column(TokenHashes(GraftShim.expression(text)))

  def sortedJaccard(a: Column, b: Column): Column =
    GraftShim.column(SortedJaccard(GraftShim.expression(a), GraftShim.expression(b)))

  def sortedIntersect(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersect(GraftShim.expression(a), GraftShim.expression(b)))

  def hyperplaneBuckets(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    GraftShim.column(HyperplaneBuckets(GraftShim.expression(vec), planes))

  def winnowingFingerprints(text: Column, k: Int, w: Int): Column =
    GraftShim.column(WinnowingFingerprintHashes(GraftShim.expression(text), k, w))

  def textProfile(text: Column, sets: Seq[Seq[String]]): Column =
    GraftShim.column(TextProfile(GraftShim.expression(text), sets))

  def ngramProfile(text: Column, ns: Seq[Int]): Column =
    GraftShim.column(NGramProfile(GraftShim.expression(text), ns))

  def deflateRatio(text: Column): Column =
    GraftShim.column(DeflateRatio(GraftShim.expression(text)))

  def normalizeText(text: Column): Column =
    GraftShim.column(NormalizeText(GraftShim.expression(text)))

  def multiPatternCounts(text: Column, needles: Seq[String]): Column =
    GraftShim.column(MultiPatternCounts(GraftShim.expression(text), needles))
}
