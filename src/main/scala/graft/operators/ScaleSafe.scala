package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints.
  *
  * A bare `broadcast(dim)` hint is a scale landmine when `dim` grows
  * with the corpus: Spark executes a hinted broadcast regardless of
  * size and hard-fails above 8 GB (and OOMs the driver well before
  * that). TPC-H-shaped dims split into two classes:
  *
  *  - genuinely bounded (region: 5 rows, nation: 25 rows) — a plain
  *    hint is always right;
  *  - SF-proportional (customer, supplier, part and anything derived
  *    from them) — small at bench scale, terabytes at 100 TB. These
  *    must only be hinted when their measured size says so.
  *
  * [[broadcastIfSmall]] gates the hint on the sum of LEAF scan sizes
  * of the side's optimized plan. Leaves carry real file statistics;
  * the intermediate estimates of the size-only stats visitor are
  * useless for this decision (filters don't shrink them and joins
  * multiply them), while for the FK-shaped dim sides gated here the
  * output never materially exceeds its inputs. When the gate refuses,
  * the un-hinted side falls through to Catalyst/AQE: auto-broadcast
  * if runtime stats come in under `autoBroadcastJoinThreshold`,
  * otherwise a shuffled join with AQE skew handling — the only plans
  * that survive a 1000-executor 100 TB run.
  *
  * The cap (`spark.graft.broadcast.maxBytes`, default 256 MiB) is
  * deliberately far below Spark's 8 GB broadcast hard limit: a
  * broadcast must fit the driver AND every executor simultaneously,
  * and file bytes expand when decoded (parquet dictionary/RLE
  * columns inflate several-fold as unsafe rows). Setting it to 0
  * disables all gated hints (used by PlanSpec to assert the
  * large-regime plan shape on small data).
  */
object ScaleSafe {
  val MaxBytesKey = "spark.graft.broadcast.maxBytes"
  val DefaultMaxBytes: Long = 256L << 20

  /** Estimated on-disk bytes feeding `df`: sum of leaf-relation sizes.
    * Read off the ANALYZED plan — leaf relations and their file-size
    * stats are identical in the optimized plan, and skipping the
    * optimizer avoids paying a full Catalyst optimization pass per
    * gated side at DataFrame-construction time (the outer query
    * re-optimizes the subtree anyway).
    */
  def leafScanBytes(df: DataFrame): BigInt =
    df.queryExecution.analyzed.collectLeaves().map(_.stats.sizeInBytes).sum

  /** Hint `df` for broadcast only when its leaf scans are provably
    * small; otherwise return it unchanged and let AQE decide.
    */
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val cap = df.sparkSession.conf.get(MaxBytesKey, DefaultMaxBytes.toString).toLong
    if (cap > 0 && leafScanBytes(df) <= BigInt(cap)) broadcast(df) else df
  }
}
