package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert versioning: latest row per merge key wins.
  *
  * The reference's `UpsertBlobStagedBatchFactory` keeps the newest version
  * of each primary key when staging blobs (its integration test expects
  * exactly one row per distinct key after streaming many files —
  * /root/reference/src/test/scala/tests/IntegrationTests.scala:176-181).
  *
  * Spark-first: a single aggregation with `max_by(payload, order)`. The
  * struct payload makes Spark pick SortAggregate, but the property that
  * matters at 100 TB holds and is asserted in PlanSpec: map-side partial
  * aggregation (each task keeps one candidate row per key before the
  * shuffle), so the single shuffle carries at most |distinct keys| rows
  * per task — strictly cheaper than the window-function formulation
  * (full shuffle of all rows + per-key sort).
  * The `orderCols` tuple must be unique per key for determinism; callers
  * pass (versionCol, uniqueTiebreakCol).
  */
object Upsert {
  def latestByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord     = struct(orderCols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__row"))
      .select("__row.*")
  }
}
