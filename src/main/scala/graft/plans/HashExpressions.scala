package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions (with whole-stage codegen) for the hot
  * hashing loops of the dedup family. The higher-order-function
  * formulations evaluate interpreted lambdas per array element AND get
  * re-evaluated once per band/chunk after projection collapse — ~100×
  * slower at sf0.1. These expressions do one tight JIT'd pass per row.
  *
  * The permutation family is h_i(x) = a_i·x + b_i with odd a_i over the
  * full 2^64 ring (wrapping multiply is intended — this expression is
  * outside ANSI arithmetic checks by construction).
  */
object HashCoefficients {
  val NumPerm = 64
  private val rnd = new java.util.SplittableRandom(0x5eed5eed5eedL)
  val A: Array[Long] = Array.fill(NumPerm)(rnd.nextLong() | 1L)
  val B: Array[Long] = Array.fill(NumPerm)(rnd.nextLong())
}

/** MinHash signature of a shingle-hash array: numPerm running minima. */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {
  require(numPerm > 0 && numPerm <= HashCoefficients.NumPerm)

  override def dataType: DataType                = ArrayType(LongType, containsNull = false)

  private[plans] def compute(arr: ArrayData): Array[Long] = {
    val a    = HashCoefficients.A
    val b    = HashCoefficients.B
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var p = 0
      while (p < numPerm) {
        val v = a(p) * h + b(p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    mins
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(compute(input.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", HashCoefficients.A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", HashCoefficients.B, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i    = ctx.freshName("i")
      val p    = ctx.freshName("p")
      val h    = ctx.freshName("h")
      val v    = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $p = 0; $p < $numPerm; $p++) {
         |    long $v = $aRef[$p] * $h + $bRef[$p];
         |    if ($v < $mins[$p]) $mins[$p] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** LSH band hashes computed in the same pass as the MinHash signature:
  * band j = mix of signature rows [j·r, (j+1)·r). Returning the band
  * array directly means the (expensive) signature is never re-evaluated
  * per band by projection collapse.
  */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands * rowsPerBand <= HashCoefficients.NumPerm)

  override def dataType: DataType                = ArrayType(LongType, containsNull = false)

  private val sig = MinHashSignature(child, bands * rowsPerBand)

  override def nullSafeEval(input: Any): Any = {
    val mins = sig.compute(input.asInstanceOf[ArrayData])
    val out  = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var h = 1125899906842597L
      var r = 0
      while (r < rowsPerBand) { h = h * 31L + mins(j * rowsPerBand + r); r += 1 }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val numPerm = bands * rowsPerBand
    val aRef    = ctx.addReferenceObj("minhashA", HashCoefficients.A, "long[]")
    val bRef    = ctx.addReferenceObj("minhashB", HashCoefficients.B, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins  = ctx.freshName("mins")
      val out   = ctx.freshName("bandHashes")
      val i     = ctx.freshName("i")
      val p     = ctx.freshName("p")
      val j     = ctx.freshName("j")
      val r     = ctx.freshName("r")
      val h     = ctx.freshName("h")
      val v     = ctx.freshName("v")
      val bh    = ctx.freshName("bh")
      s"""
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $p = 0; $p < $numPerm; $p++) {
         |    long $v = $aRef[$p] * $h + $bRef[$p];
         |    if ($v < $mins[$p]) $mins[$p] = $v;
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $j = 0; $j < $bands; $j++) {
         |  long $bh = 1125899906842597L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $bh = $bh * 31L + $mins[$j * $rowsPerBand + $r];
         |  }
         |  $out[$j] = $bh;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** 64-bit SimHash of a token-hash array: bit j of the result is set iff
  * more tokens have bit j set than cleared.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType                = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr   = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i     = ctx.freshName("i")
      val j     = ctx.freshName("j")
      val h     = ctx.freshName("h")
      val fp    = ctx.freshName("fp")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** SimHash fingerprint + its pigeonhole chunks in ONE pass: returns
  * [simhash, chunk0..chunk(n-1)] so projection collapse cannot
  * re-evaluate the vote loop once per chunk (the simhash analog of
  * MinHashBands).
  *
  * The 64 bits are split into `numChunks` near-equal contiguous chunks
  * (the first `64 % numChunks` chunks get the extra bit). Pigeonhole:
  * any pair within hamming distance `numChunks - 1` agrees exactly on
  * at least one chunk, so chunk-bucket joins are a complete blocking
  * scheme for that radius. Chunk values are NOT position-tagged:
  * disambiguation across chunk positions relies on callers joining on
  * the chunk index as well as the value (Dedup.simhashNearDups joins
  * on (chunk_id, chunk_val)).
  */
case class SimHashWithChunks(child: Expression, numChunks: Int) extends UnaryExpression {
  require(numChunks >= 1 && numChunks <= 64, s"numChunks must be in [1, 64], got $numChunks")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val sim = SimHash64(child)

  // chunk c covers bits [offsets(c), offsets(c) + widths(c))
  private val widths: Array[Int] = {
    val base = 64 / numChunks
    val rem  = 64 % numChunks
    Array.tabulate(numChunks)(c => if (c < rem) base + 1 else base)
  }
  private val offsets: Array[Int] = widths.scanLeft(0)(_ + _).init

  override def nullSafeEval(input: Any): Any = {
    val fp  = sim.nullSafeEval(input).asInstanceOf[Long]
    val out = new Array[Long](numChunks + 1)
    out(0) = fp
    var c = 0
    while (c < numChunks) {
      val mask = if (widths(c) == 64) -1L else (1L << widths(c)) - 1L
      out(c + 1) = (fp >>> offsets(c)) & mask
      c += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offRef  = ctx.addReferenceObj("simhashChunkOffsets", offsets, "int[]")
    val maskArr = widths.map(w => if (w == 64) -1L else (1L << w) - 1L)
    val maskRef = ctx.addReferenceObj("simhashChunkMasks", maskArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i     = ctx.freshName("i")
      val j     = ctx.freshName("j")
      val h     = ctx.freshName("h")
      val fp    = ctx.freshName("fp")
      val out   = ctx.freshName("out")
      val ch    = ctx.freshName("ch")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $fp |= (1L << $j);
         |}
         |long[] $out = new long[${numChunks + 1}];
         |$out[0] = $fp;
         |for (int $ch = 0; $ch < $numChunks; $ch++) {
         |  $out[$ch + 1] = ($fp >>> $offRef[$ch]) & $maskRef[$ch];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashWithChunks =
    copy(child = newChild)
}

/** Column-API wrappers. */
object GraftExpressions {
  private def expr(c: Column) = GraftShim.expression(c)

  def minhashSignature(shingleHashes: Column, numPerm: Int): Column =
    GraftShim.column(MinHashSignature(expr(shingleHashes), numPerm))

  def minhashBands(shingleHashes: Column, bands: Int, rowsPerBand: Int): Column =
    GraftShim.column(MinHashBands(expr(shingleHashes), bands, rowsPerBand))

  def simhash64(tokenHashes: Column): Column =
    GraftShim.column(SimHash64(expr(tokenHashes)))

  def simhashWithChunks(tokenHashes: Column, numChunks: Int): Column =
    GraftShim.column(SimHashWithChunks(expr(tokenHashes), numChunks))
}
