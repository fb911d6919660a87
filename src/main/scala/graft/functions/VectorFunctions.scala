package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns using built-in higher-order
  * functions — fully codegen'd, no UDFs. The folds are sequential
  * left-to-right, which makes the results bit-identical to DuckDB's
  * `list_dot_product` / `list_cosine_similarity` loops (verified
  * empirically), so cosine values can sit under the exact-hash oracle.
  *
  * Embeddings arrive as `array<float>`; `asDouble` widens element-wise
  * (exact) before any arithmetic.
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** Native codegen'd expression (plans/CosineExpression.scala); same
    * sequential accumulation order as the fold formulation below, so the
    * value is unchanged — only ~50× faster per pair.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity.column(a, b)

  /** HOF formulation kept as the reference implementation (specs assert
    * the native expression matches it bit-for-bit).
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Pre-normalize once so repeated comparisons are a dot product only —
    * the right shape for ANN where each vector is compared many times.
    */
  def normalized(v: Column): Column = {
    val n = sqrt(normSq(v))
    transform(v, x => x / n)
  }
}
