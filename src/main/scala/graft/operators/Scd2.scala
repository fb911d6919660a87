package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder: turn a change log
  * (key, tracked attributes, change timestamp) into versioned dimension
  * rows `[valid_from, valid_to)` with an `is_current` flag — the
  * standard warehouse shape downstream of the CDC surface
  * ([[SnapshotDiff]] / [[graft.streaming.ChangeCapture]] produce the
  * change stream; this materializes its history).
  *
  * Two rules define SCD2:
  *  1. a change event whose tracked attributes equal the previous
  *     version's is a NO-OP — it must not open a new version (CDC feeds
  *     routinely re-emit unchanged rows; a naive builder would explode
  *     the dimension with zero-length duplicates);
  *  2. `valid_to` of version i is `valid_from` of version i+1
  *     (half-open intervals tile the timeline with no gaps/overlaps);
  *     the latest version has `valid_to = null`, `is_current = true`.
  *
  * Spark-first: both the no-op collapse (`lag` over the attribute
  * struct) and the interval close (`lead` over the survivors) use the
  * SAME window spec — Catalyst plans ONE hash-partition exchange and
  * ONE sort, so the whole build is a single key-partitioned pass.
  * That is the property that holds at 100 TB: cost is one shuffle of
  * the change log, state per task is one previous-row buffer, and a
  * hot key degrades to a per-key sort, never a cross product.
  *
  * `orderCols` breaks change-time ties deterministically (pass the
  * change-log sequence/event id); ties left ambiguous would make the
  * collapse engine-dependent.
  */
object Scd2 {
  def buildHistory(
      changes: DataFrame, keys: Seq[String], attrs: Seq[String],
      tsCol: String, orderCols: Seq[String], keepOrder: Boolean = false
  ): DataFrame = {
    val ord = (col(tsCol) +: orderCols.map(col)).map(_.asc)
    val w   = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)

    val attrStruct = struct(attrs.map(col): _*)
    val survivors = changes
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      // first change for the key, or any tracked attribute moved
      .filter(col("__prev").isNull || col("__prev") =!= attrStruct)

    // same partition keys AND sort as `w` → Catalyst reuses both the
    // exchange and the sort; orderCols stay in the ordering so two
    // versions opening at the SAME timestamp still chain
    // deterministically (valid_to alone would be ambiguous)
    val outCols = (keys ++ attrs).map(col) ++ Seq(col(tsCol).as("valid_from"),
      col("valid_to"), col("is_current")) ++ (if (keepOrder) orderCols.map(col) else Nil)
    survivors
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(outCols: _*)
  }

  /** Point-in-time dimension lookup — the CONSUMPTION side of SCD2:
    * each fact row gets the dimension version valid at its timestamp
    * (`valid_from <= ts < valid_to`). Because versions tile the
    * timeline half-open, "the version containing ts" IS "the latest
    * version with valid_from <= ts", so this delegates to
    * [[AsOfJoin.backward]]'s union + carry-forward plan: ONE shuffle
    * on the keys, no interval cross product, no per-key join
    * duplication — the shape that survives a fact table 1000× the
    * dimension. Facts before their key's first version keep null
    * attributes (left semantics). Attributes arrive as
    * `last_<attr>` / `last_valid_from`, [[AsOfJoin]]'s convention.
    */
  def lookupAsOf(
      facts: DataFrame, history: DataFrame, keys: Seq[String],
      tsCol: String, attrs: Seq[String]
  ): DataFrame =
    AsOfJoin.backward(
      facts,
      history.select((keys ++ attrs :+ "valid_from").map(col): _*),
      partitionCols = keys, leftTimeCol = tsCol, rightTimeCol = "valid_from",
      payloadCols = attrs :+ "valid_from")

  /** Incremental SCD2 maintenance: fold an APPEND-ONLY change delta
    * into an existing history without rebuilding it — the daily
    * dimension refresh. Contract: every delta change is later than its
    * key's current `valid_from` (the CDC watermark guarantees this;
    * out-of-order history would need the collapsed no-ops back).
    * Under that contract only each affected key's CURRENT row can
    * change (it may close and stop being current), so the fold is:
    * replay {current row} ∪ {delta} through [[buildHistory]] for the
    * affected keys only, and keep everything else untouched — proven
    * identical to a from-scratch rebuild of the combined log
    * (Scd2Spec). `history` must carry the orderCols
    * (`keepOrder = true`) so equal-timestamp chains replay the same.
    *
    * Scale shape: cost is O(delta + closed rows), NOT O(history) — the
    * non-current rows pass through with no shuffle (the anti/semi join
    * on affected keys broadcasts the delta's key set), and the replay
    * window runs over |affected keys| · (1 + delta rows per key).
    */
  def applyChanges(
      history: DataFrame, delta: DataFrame, keys: Seq[String], attrs: Seq[String],
      tsCol: String, orderCols: Seq[String]
  ): DataFrame = {
    val affected = broadcast(delta.select(keys.map(col): _*).distinct())
    val seedCols = (keys ++ attrs).map(col) ++
      (col("valid_from").as(tsCol) +: orderCols.map(col))
    val seed = history.filter(col("is_current"))
      .join(affected, keys, "left_semi")
      .select(seedCols: _*)
    val rebuilt = buildHistory(
      seed.unionByName(delta.select((keys ++ attrs).map(col) ++
        (col(tsCol) +: orderCols.map(col)): _*)),
      keys, attrs, tsCol, orderCols, keepOrder = true)
    // untouched keys in full, plus affected keys' already-closed rows
    history.join(affected, keys, "left_anti")
      .unionByName(history.filter(!col("is_current")).join(affected, keys, "left_semi"))
      .unionByName(rebuilt)
  }
}
