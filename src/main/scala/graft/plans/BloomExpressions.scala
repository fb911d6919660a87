package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership over 64-bit hashes — the sketch that turns a
  * broadcast SET into a broadcast BITMAP. At 100 TB the exact
  * decontamination semi join broadcasts every distinct benchmark shingle
  * hash (8+ bytes each); a Bloom filter at 1% fpp carries ~1.2 bytes per
  * element, so a 1B-shingle benchmark suite fits in ~1.2 GB instead of
  * ~10s of GB — and membership tests stay O(k) bit probes inside
  * whole-stage codegen. One-sided error: false positives only, so a
  * decontamination pass can only OVER-flag (never leaks a contaminated
  * doc); the flagged set can then be exactly verified against the (tiny)
  * candidate subset if precision matters.
  *
  * The filter's serialized bytes ride the expression into the plan; the
  * sketch is rebuilt lazily per executor (transient), and codegen calls
  * straight into it — no UDF, no fallback out of codegen.
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  def mightContain(h: Long): Boolean = bloom.mightContainLong(h)

  override def nullSafeEval(input: Any): Any = mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression (serializable case class); the bloom
    // sketch deserializes once per executor via the transient lazy val
    val ref = ctx.addReferenceObj("graftBloomExpr", this, classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContain($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomExpressions {
  /** Serialize a built sketch for the expression. */
  def toBytes(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  def mightContainLong(hash: Column, bloom: BloomFilter): Column =
    GraftShim.column(BloomMightContainLong(GraftShim.expression(hash), toBytes(bloom)))
}
