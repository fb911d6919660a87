package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** IVF coarse quantization: the `m` nearest centroid cell ids of a
  * vector, by cosine against a broadcast centroid table (centroids ride
  * in the expression — they are driver-trained and small by contract).
  * One pass per row over nCells·dim multiplies; `m = 1` assigns a
  * candidate to its cell, `m = nProbe` selects the cells a probe visits.
  */
case class CentroidCells(child: Expression, centroids: Array[Array[Double]], m: Int,
    l2: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty && m >= 1)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val centroidNorms: Array[Double] =
    VectorQuantization.centroidNorms(centroids)

  @transient private lazy val centroidSqNorms: Array[Double] =
    centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(VectorQuantization.nearestCells(
      input.asInstanceOf[ArrayData].toDoubleArray(),
      centroids, m, l2, centroidNorms, centroidSqNorms))

  override protected def withNewChildInternal(newChild: Expression): CentroidCells =
    copy(child = newChild)
}

object VectorQuantization {

  /** Clamped cosine norms of a centroid table — ONE formula for the
    * expression's lazy val, the driver-side fallback, and serve-time
    * precomputes: cell borders are bit-identity-load-bearing between
    * staging and serving, so the clamp and accumulation order must
    * never fork.
    */
  def centroidNorms(centroids: Array[Array[Double]]): Array[Double] =
    centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.max(math.sqrt(s), 1e-12)
    }

  /** The `m` nearest centroid cell ids of one vector — the ONE
    * assignment arithmetic, shared by the [[CentroidCells]] expression
    * (per-row, executor-side) and the driver-side probe preparation
    * ([[graft.operators.AnnIndex]] serves): a probe's cells computed on
    * the driver are bit-identical to the cells the rows were staged
    * with, because both run THIS code on the same manifest centroids.
    */
  def nearestCells(vec: Array[Double], centroids: Array[Array[Double]], m: Int,
      l2: Boolean = false,
      normsPre: Array[Double] = null, sqNormsPre: Array[Double] = null): Array[Int] = {
    val norms = if (l2 || normsPre != null) normsPre
      else centroidNorms(centroids)
    val sqNorms = if (!l2 || sqNormsPre != null) sqNormsPre
      else centroids.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i) * c(i); i += 1 }
        s
      }
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val dim = math.min(cen.length, vec.length)
      var dot = 0.0
      var i   = 0
      while (i < dim) { dot += cen(i) * vec(i); i += 1 }
      // cosine rank (vector norm constant per row: rank-invariant) or
      // L2 rank: argmin ||v-c||² = argmax 2·dot − ||c||² (drop ||v||²)
      sims(c) = if (l2) 2 * dot - sqNorms(c) else dot / norms(c)
      c += 1
    }
    val mm  = math.min(m, centroids.length)
    val out = new Array[Int](mm)
    val used = new Array[Boolean](centroids.length)
    var j = 0
    while (j < mm) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < sims.length) {
        if (!used(i) && sims(i) > bestSim) { best = i; bestSim = sims(i) }
        i += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    out
  }

  def centroidCells(vec: Column, centroids: Array[Array[Double]], m: Int): Column =
    GraftShim.column(CentroidCells(GraftShim.expression(vec), centroids, m))

  def centroidCellsL2(vec: Column, centroids: Array[Array[Double]], m: Int): Column =
    GraftShim.column(CentroidCells(GraftShim.expression(vec), centroids, m, l2 = true))

  /** Standard (L2) Lloyd's k-means over a bounded sample — the PQ
    * sub-codebook trainer. Unlike the spherical variant, centroids keep
    * their magnitudes (means, not normalized means): PQ's ADC lookup
    * reconstructs dot products from codewords, so codeword NORMS carry
    * signal the spherical quantizer would erase. Deterministic: seeded
    * init, fixed iteration count; an emptied cluster keeps its previous
    * centroid.
    */
  def trainCentroidsL2(sample: Array[Array[Double]], nCells: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty)
    val dim = sample.head.length
    val k   = math.min(nCells, sample.length)
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(sample.indices.toVector).take(k).map(i => sample(i).clone()).toArray

    var it = 0
    while (it < iters) {
      val sums   = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0
        var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0; var sq = 0.0; var i = 0
          while (i < dim) { dot += centroids(c)(i) * v(i); sq += centroids(c)(i) * centroids(c)(i); i += 1 }
          val score = 2 * dot - sq // argmin L2 without the per-vector term
          if (score > bestScore) { best = c; bestScore = score }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** Driver-side spherical k-means (Lloyd's on cosine) over a bounded
    * training sample — the IVF coarse quantizer. Deterministic: seeded
    * init, fixed iteration count. nCells and sample size are small by
    * contract (the centroid table is broadcast into an expression).
    */
  def trainCentroids(sample: Array[Array[Double]], nCells: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty)
    val dim = sample.head.length
    val k   = math.min(nCells, sample.length)
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(sample.indices.toVector).take(k).map(i => sample(i).clone()).toArray

    def normalize(v: Array[Double]): Unit = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.max(math.sqrt(s), 1e-12)
      i = 0
      while (i < v.length) { v(i) /= n; i += 1 }
    }
    centroids.foreach(normalize)

    var it = 0
    while (it < iters) {
      val sums   = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0
        var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += centroids(c)(i) * v(i); i += 1 }
          if (dot > bestDot) { best = c; bestDot = dot }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
          normalize(centroids(c))
        }
        c += 1
      }
      it += 1
    }
    centroids
  }
}
