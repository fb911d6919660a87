package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator ANN top-k as a custom logical node + planner strategy +
  * physical operator (the tier-(c) extension route: LogicalPlan →
  * Strategy → SparkPlan via SparkSessionExtensions).
  *
  * Why a custom operator: the declarative formulation (cross join +
  * window rank) materializes and SORTS every (probe, candidate) pair —
  * O(P·N log N) with P·N intermediate rows. This operator keeps a
  * bounded k-heap per probe per partition, emitting only
  * partitions·P·k rows — the asymptotic win a 100 TB corpus needs. A
  * thin declarative final ranking (one shuffle over the tiny partial
  * top-k set) picks the global top-k per probe.
  *
  * The child must project exactly [id: long, vec: array<double>];
  * probes ride along in the node (they are the broadcast side by
  * contract).
  */
case class AnnTopKNode(
    child: LogicalPlan,
    probes: Seq[(Long, Array[Double])],
    k: Int,
    // carried as a field so optimizer copies keep stable expression ids
    output: Seq[Attribute]
) extends UnaryNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(newChild: LogicalPlan): AnnTopKNode =
    copy(child = newChild)
}

object AnnTopKNode {
  def apply(child: LogicalPlan, probes: Seq[(Long, Array[Double])], k: Int): AnnTopKNode =
    AnnTopKNode(child, probes, k, Seq(
      AttributeReference("probe_id", LongType, nullable = false)(),
      AttributeReference("neighbor_id", LongType, nullable = false)(),
      AttributeReference("cosine", DoubleType, nullable = false)()
    ))
}

case class AnnTopKExec(
    child: SparkPlan,
    probes: Seq[(Long, Array[Double])],
    k: Int,
    output: Seq[Attribute]
) extends UnaryExecNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val localProbes = probes.toArray
    val localK      = k
    child.execute().mapPartitions { rows =>
      // one bounded min-heap per probe: (cosine, neighborId)
      val heaps = Array.fill(localProbes.length)(
        new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by[(Double, Long), Double](_._1).reverse))
      // pre-normalize probes once per partition
      val pNorm = localProbes.map { case (_, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.sqrt(s)
      }
      // scratch buffer reused across rows: copying the candidate vector
      // out of ArrayData once per ROW (not once per probe) also lets the
      // norm be computed once per row — the probe loop is then a pure
      // dot product over a primitive array
      var scratch = new Array[Double](0)
      rows.foreach { row =>
        val id  = row.getLong(0)
        val arr = row.getArray(1)
        val n   = arr.numElements()
        if (scratch.length < n) scratch = new Array[Double](n)
        var nc = 0.0
        var i  = 0
        while (i < n) {
          val x = arr.getDouble(i)
          scratch(i) = x
          nc += x * x
          i += 1
        }
        val cNorm = math.sqrt(nc)
        var p = 0
        while (p < localProbes.length) {
          val pv  = localProbes(p)._2
          val dim = math.min(n, pv.length)
          var dot = 0.0
          var j   = 0
          while (j < dim) {
            dot += scratch(j) * pv(j)
            j += 1
          }
          val cos  = dot / (cNorm * pNorm(p))
          val heap = heaps(p)
          if (heap.size < localK) heap.enqueue((cos, id))
          else if (cos > heap.head._1) { heap.dequeue(); heap.enqueue((cos, id)) }
          p += 1
        }
      }
      // downstream operators consume UnsafeRows
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(Array[org.apache.spark.sql.types.DataType](LongType, LongType, DoubleType))
      heaps.iterator.zipWithIndex.flatMap { case (heap, p) =>
        val probeId = localProbes(p)._1
        heap.iterator.map { case (cos, id) => proj(InternalRow(probeId, id, cos)).copy() }
      }
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): AnnTopKExec =
    copy(child = newChild)
}

object AnnTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AnnTopKNode(child, probes, k, out) =>
      AnnTopKExec(planLater(child), probes, k, out) :: Nil
    case _ => Nil
  }
}
