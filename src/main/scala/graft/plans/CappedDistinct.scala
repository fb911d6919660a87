package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Saturating distinct membership: a long buffer that stores distinct
  * input values only until it has seen `k` of them, then never grows.
  *
  * This is the exact primitive behind threshold tests like "does this
  * span occur in at least `minDocs` distinct documents?": once k
  * distinct ids are witnessed the true distinct count is provably >= k,
  * so the remaining (possibly millions of) occurrences of a boilerplate
  * gram cost O(1) each and shuffle O(k) bytes. A plain
  * `countDistinct >= k` plans as TWO exchanges (dedup on (group, id),
  * then count on group) and shuffles every distinct pair; this is ONE
  * exchange with per-group state bounded by k — the difference between
  * O(distinct pairs) and O(groups·k) on the wire, which is what a dense
  * 100 TB corpus (every 5-gram repeated) needs.
  */
final class CappedIdSet(val k: Int) {
  // linear-scan small array: k is a threshold like 2..10, not a set size
  val ids: Array[Long] = new Array[Long](k)
  var n: Int           = 0

  def add(id: Long): Unit = {
    if (n >= k) return
    var i = 0
    while (i < n) { if (ids(i) == id) return; i += 1 }
    ids(n) = id
    n += 1
  }
}

/** `distinct_at_least(id, k)`: true iff the group contains >= k distinct
  * non-null ids. Exact, one exchange, O(k) state per group.
  */
case class DistinctAtLeastAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CappedIdSet] {
  require(k >= 1, s"distinct_at_least: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def dataType: DataType        = BooleanType

  override def createAggregationBuffer(): CappedIdSet = new CappedIdSet(k)

  override def update(buffer: CappedIdSet, input: InternalRow): CappedIdSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CappedIdSet, other: CappedIdSet): CappedIdSet = {
    var i = 0
    while (i < other.n && buffer.n < k) { buffer.add(other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: CappedIdSet): Any = buffer.n >= k

  override def serialize(buffer: CappedIdSet): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.n * 8)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedIdSet = {
    val bb  = java.nio.ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val out = new CappedIdSet(k)
    var i   = 0
    while (i < n) { out.add(bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctAtLeastAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctAtLeastAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DistinctAtLeastAgg =
    copy(child = newChildren.head)
}

object CappedDistinct {
  /** True iff the group holds >= k distinct non-null long ids. */
  def distinctAtLeast(id: Column, k: Int): Column =
    GraftShim.column(DistinctAtLeastAgg(GraftShim.expression(id), k).toAggregateExpression())
}
