package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-level snapshot diff — the inverse of MERGE: given two versions of
  * a table, produce the change stream (added / deleted / changed per
  * merge key) that would transform one into the other. The reference
  * consumes change feeds (arcane's CDC input); this operator produces
  * one from plain snapshots — the bootstrap path when a source system
  * has no native CDC.
  *
  * Plan shape: ONE full-outer hash join on the key — each side shuffles
  * once; for bucketed/co-partitioned snapshot tables the join is
  * shuffle-free. Comparison is null-safe (`<=>`) per compared column, so
  * null→value and value→null both classify as changed; side presence
  * comes from explicit marker columns, not payload nullness, so all-null
  * payloads classify correctly. Unchanged keys are filtered out BEFORE
  * any downstream consumer sees the stream, so output is proportional to
  * churn, not table size — the property that makes snapshot-diff viable
  * at 100 TB daily.
  */
object SnapshotDiff {

  def diff(old: DataFrame, neu: DataFrame, keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = old.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("old_" + _): _*)
      .withColumn("__in_old", lit(true))
    val n = neu.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("new_" + _): _*)
      .withColumn("__in_new", lit(true))

    val same = compareCols.map(c => col(s"old_$c") <=> col(s"new_$c")).reduce(_ && _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "deleted")
          .when(!same, "changed")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .drop("__in_old", "__in_new")
  }

  /** CDC replay — apply a [[diff]]-shaped change stream to a snapshot,
    * producing the next snapshot: `applyChanges(old, diff(old, new)) ==
    * new` EXACTLY (the oracle for `cdc_apply` is literally the target
    * snapshot). One anti-join on the churn-sized drop keys + one union.
    * No broadcast hint on the anti-join: modest churn broadcasts by
    * stats/AQE (history never shuffles); churn too large to broadcast
    * falls back to a shuffled join, which is then genuinely necessary —
    * either way the apply cost is O(history scan + churn), the property
    * MERGE has.
    */
  def applyChanges(old: DataFrame, changes: DataFrame,
      keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val dropKeys = changes
      .filter(col("change_type").isin("deleted", "changed"))
      .select(keys.map(col): _*)
    val upserts = changes
      .filter(col("change_type").isin("added", "changed"))
      .select(keys.map(col) ++ compareCols.map(c => col(s"new_$c").as(c)): _*)
    old.select(keys.map(col) ++ compareCols.map(col): _*)
      .join(dropKeys, keys, "left_anti")
      .unionByName(upserts)
  }
}
