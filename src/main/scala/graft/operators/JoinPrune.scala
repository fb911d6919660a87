package graft.operators

import graft.plans.BloomExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-shuffle join pruning: when the dimension side is selective but
  * too large (or too late-derived) to broadcast, a shuffle join moves
  * EVERY fact row — including the ones no dimension key will ever
  * match. Building a bloom filter over the dimension keys and filtering
  * the fact side BEFORE its exchange removes those rows for the cost of
  * one scan-local predicate: the shuffle shrinks by the non-matching
  * share, and false positives are eliminated by the join itself, so the
  * result is EXACT — the filter moves work, never the answer.
  *
  * This is the manual, persistable form of Spark's runtime bloom
  * pushdown (spark.sql.optimizer.runtime.bloomFilter.*, which only
  * triggers under cost heuristics): the filter here is built once,
  * deterministically, and can be reused across queries touching the
  * same dimension slice — e.g. "this month's active customers" pruning
  * every fact table in a reporting suite.
  */
object JoinPrune {

  /** Inner equi-join with the fact side bloom-pruned before the
    * shuffle. `expectedKeys`/`fpp` size the filter (bits ≈
    * −n·ln(fpp)/ln²2 — 1M keys at 1% ≈ 1.2 MB, broadcast-friendly);
    * a higher fpp only leaks more non-matching rows into the shuffle,
    * never changes the result.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    fact
      .filter(BloomExpressions.mightContainLong(col(factKey), bloom))
      .join(dim, col(factKey) === col(dimKey))
  }
}
