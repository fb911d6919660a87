package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (DataSketches KLL, on Spark's own
  * classpath — the library behind Spark 4's hll/approx_top_k
  * built-ins), completing the sketch triad next to the HLL ndv and
  * frequent-items families in [[graft.operators.Sketches]].
  *
  * Why not the built-in `percentile_approx`: its partial state cannot
  * be PERSISTED — every coarser rollup rescans the corpus. A KLL
  * sketch is a first-class binary column: persist per-(group, shard)
  * sketches once (per day / per source / per ingest batch), answer any
  * coarser quantile question later by unioning sketch bytes. Union is
  * associative and commutative, so rollups compose across partitions,
  * files, and days — the 100 TB shape, identical to the HLL pattern.
  *
  * Error: normalized RANK error ~1.65% at the k=200 default (single
  * sketch; the sketch reports its own bound via getNormalizedRankError,
  * which the spec asserts). Exactness regime: while a group's count
  * stays ≤ k the sketch retains every value and never compacts, so
  * quantiles are EXACT order statistics — the regime the oracle-gated
  * queries run in (same design as the frequent-items gate). Above k,
  * compaction flips coins from a process-wide RNG, so sketch BYTES are
  * not run-deterministic — estimates stay within the rank bound
  * regardless of merge order; determinism claims live only in the
  * exact regime.
  *
  * Quantile rule (INCLUSIVE): the q-quantile is the smallest retained
  * value whose inclusive weighted rank ≥ q. With all n values retained
  * that is the ceil(q·n)-th smallest — exactly expressible in ANSI SQL
  * as `rn = GREATEST(1, CEIL(q*n))` over `row_number()`, which is what
  * the DuckDB oracle pins.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def children: Seq[Expression]         = Seq(child)
  override def nullable: Boolean                 = false
  override def dataType: DataType                = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Union of persisted KLL sketch bytes — the rollup aggregate. The
  * result is a sketch again (k of THIS union), so rollups chain:
  * day → month → year without ever touching row data.
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def children: Seq[Expression]         = Seq(child)
  override def nullable: Boolean                 = false
  override def dataType: DataType                = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllUnionAgg =
    copy(child = newChildren.head)
}

/** Extract quantiles from persisted sketch bytes: array of the
  * INCLUSIVE-rule quantiles for `probs` (see rank-rule note on the
  * companion object). Null for an empty sketch (all-null group).
  * Scalar over summary-sized rows — never in a per-row hot path, so
  * CodegenFallback costs nothing.
  */
case class KllQuantiles(sketch: Expression, probs: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression]         = Seq(sketch, probs)
  override def nullable: Boolean                 = true
  override def dataType: DataType                = ArrayType(DoubleType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val s = sketch.eval(input)
    val p = probs.eval(input)
    if (s == null || p == null) return null
    val sk = KllDoublesSketch.heapify(Memory.wrap(s.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val ps  = p.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Any](ps.length)
    var i   = 0
    while (i < ps.length) {
      out(i) = sk.getQuantile(ps(i), QuantileSearchCriteria.INCLUSIVE)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(sketch = newChildren(0), probs = newChildren(1))
}

/** Stream length recorded in the sketch — exact (a counter, not an
  * estimate), so rollup accounting is verifiable: n of a union equals
  * the sum of partial n's.
  */
case class KllN(sketch: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression]         = Seq(sketch)
  override def nullable: Boolean                 = true
  override def dataType: DataType                = LongType

  override def eval(input: InternalRow): Any = {
    val s = sketch.eval(input)
    if (s == null) return null
    KllDoublesSketch.heapify(Memory.wrap(s.asInstanceOf[Array[Byte]])).getN
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllN =
    copy(sketch = newChildren.head)
}

object KllExpressions {
  def kllSketchAgg(value: Column, k: Int): Column =
    GraftShim.column(
      KllSketchAgg(GraftShim.expression(value.cast("double")), k).toAggregateExpression())

  def kllUnionAgg(sketch: Column, k: Int): Column =
    GraftShim.column(
      KllUnionAgg(GraftShim.expression(sketch), k).toAggregateExpression())

  def kllQuantiles(sketch: Column, probs: Column): Column =
    GraftShim.column(KllQuantiles(GraftShim.expression(sketch), GraftShim.expression(probs)))

  def kllN(sketch: Column): Column =
    GraftShim.column(KllN(GraftShim.expression(sketch)))
}
