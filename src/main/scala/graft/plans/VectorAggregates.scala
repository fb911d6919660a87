package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector sum aggregate — the missing primitive for
  * DISTRIBUTED centroid updates (Lloyd's k-means): Spark has `sum` for
  * scalars but nothing that folds `array<double>` columns element-wise
  * without a posexplode (which multiplies the shuffle by the embedding
  * dimension). Buffer is a bare double array sized lazily from the
  * first row, merged pairwise — partial aggregation keeps the exchange
  * at O(groups·dim), independent of row count.
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = true
  override def dataType: DataType        = ArrayType(DoubleType, containsNull = false)

  // empty array = "no rows seen yet" (vectors have dim >= 1 by contract)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData].toDoubleArray()
    if (buffer.isEmpty) arr.clone()
    else {
      require(buffer.length == arr.length,
        s"vector_sum: mixed dimensions ${buffer.length} vs ${arr.length}")
      var i = 0
      while (i < arr.length) { buffer(i) += arr(i); i += 1 }
      buffer
    }
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other
    else {
      require(buffer.length == other.length,
        s"vector_sum: mixed dimensions ${buffer.length} vs ${other.length}")
      var i = 0
      while (i < other.length) { buffer(i) += other(i); i += 1 }
      buffer
    }
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer.map(_.asInstanceOf[Any]))

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb  = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i   = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
}

object VectorAggregates {
  def vectorSum(vec: Column): Column =
    GraftShim.column(VectorSumAgg(GraftShim.expression(vec)).toAggregateExpression())
}
