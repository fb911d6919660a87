package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the validation pass a pipeline runs
  * before promoting a batch (reference analogue: the stream operator
  * rejects malformed rows before the sink commit; here the checks are
  * batch-declarative and return a violation summary instead of failing
  * row-by-row).
  *
  * Scale shape: all row-level checks (`notNull`, `inRange`, `matches`,
  * custom predicates) compile into ONE aggregation pass over the table —
  * each check is a `sum(when(violated, 1))` column, so a 100 TB table is
  * scanned once with no shuffle beyond the final single-row combine.
  * `unique` needs a hash aggregation on the key (one shuffle);
  * `refIntegrity` is a broadcast anti-join when the referenced dimension
  * is small (always, for dims) — the fact side never shuffles.
  */
object DataQuality {

  /** A row-level check: name + violation predicate. */
  final case class Check(name: String, violated: Column)

  def notNull(c: String): Check = Check(s"not_null_$c", col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range_$c", col(c).isNull || col(c) < lo || col(c) > hi)

  def matches(c: String, regex: String): Check =
    Check(s"matches_$c", !col(c).rlike(regex))

  /** All row-level checks in one scan: summary (check, violations, total).
    * `sum` over an empty table is null — coalesced to 0 so an empty batch
    * reads as "no violations", not as unknown.
    */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(ch =>
      sum(when(ch.violated, 1L).otherwise(0L)).as(ch.name))
    val wide = df.agg(aggs.head, (aggs.tail :+ count(lit(1)).as("_total")): _*)
    // unpivot the single wide row to (check, violations, total)
    val pairs = checks.map(ch =>
      struct(lit(ch.name).as("check"),
        coalesce(col(ch.name), lit(0L)).as("violations"), col("_total").as("total")))
    wide.select(explode(array(pairs: _*)).as("r")).select("r.*")
  }

  /** Duplicate-key summary: one hash aggregation on the key columns. */
  def uniqueCheck(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(
        sum(when(col("n") > 1, col("n") - 1).otherwise(0L)).as("violations"),
        sum(col("n")).as("total"))
      .select(lit("unique_" + keys.mkString("_")).as("check"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        coalesce(col("total"), lit(0L)).as("total"))

  /** Standalone orphan-FK summary: broadcast anti-join against the
    * dimension keys. `gate` does NOT use this — it folds FK checks into
    * the row-check scan instead (see below); this exists for callers
    * validating a single FK without the full gate.
    */
  def refIntegrityCheck(fact: DataFrame, fk: String, dim: DataFrame, pk: String): DataFrame = {
    val orphans = fact.join(
      ScaleSafe.broadcastIfSmall(dim.select(col(pk)).distinct()), col(fk) === col(pk), "left_anti")
    orphans.agg(count(lit(1)).as("violations"))
      .crossJoin(fact.agg(count(lit(1)).as("total")))
      .select(lit(s"ref_${fk}_to_$pk").as("check"), col("violations"), col("total"))
  }

  /** Full gate: row checks + referential integrity + uniqueness.
    *
    * FK checks become LEFT joins against the (distinct, aliased)
    * dimension keys, each contributing an is-null violation column to
    * the SAME aggregation as the row-level checks — when the dims
    * measure small (size-gated hint) the fact table is scanned exactly
    * ONCE for every per-row check, however many there are. Dimension
    * key sets are SF-proportional (a 100 TB fact's customer dim is
    * itself huge), so past the gate's cap each FK check becomes an
    * AQE-planned shuffled join — more exchanges, but the only plan
    * that exists at that size. Only uniqueness always needs a second
    * pass (its hash aggregation on the key is irreducible). The union
    * glues two summary-sized frames — driver-cheap regardless of
    * input scale.
    */
  def gate(fact: DataFrame, rowLevel: Seq[Check], uniqueKeys: Seq[String],
           refs: Seq[(String, DataFrame, String)]): DataFrame = {
    // strict foldLeft (not map-with-var): evaluation must thread the
    // joined frame through EVERY ref before rowChecks scans it — a lazy
    // refs collection would otherwise skip the FK joins entirely
    val (joined, refChecks) =
      refs.toList.foldLeft((fact, List.empty[Check])) {
        case ((f, cs), (fk, dim, pk)) =>
          val pkAlias = s"__ref_${fk}_$pk"
          val j = f.join(
            ScaleSafe.broadcastIfSmall(dim.select(col(pk).as(pkAlias)).distinct()),
            col(fk) === col(pkAlias), "left_outer")
          (j, cs :+ Check(s"ref_${fk}_to_$pk", col(pkAlias).isNull))
      }
    rowChecks(joined, rowLevel ++ refChecks)
      .unionByName(uniqueCheck(fact, uniqueKeys))
  }
}
