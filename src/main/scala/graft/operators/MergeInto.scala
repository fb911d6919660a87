package graft.operators

import org.apache.spark.sql.DataFrame

/** Batch MERGE emulation: upsert a deduplicated source batch into a target
  * snapshot on a key — the semantics of the reference's
  * `MergeBatchProcessor` + `JdbcMergeServiceClient` (Trino
  * `MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`,
  * /root/reference/src/main/scala/main.scala:90).
  *
  * result = source ∪ (target ⟕anti source on key): matched target rows are
  * replaced by their source row, unmatched target rows survive, new source
  * rows are inserted. The anti join shuffles both sides on the merge key —
  * the same physical shape an Iceberg/Delta MERGE produces. When the
  * staged source batch is small relative to the target (the streaming
  * case), Spark's AQE converts the anti join to a broadcast join
  * automatically, so the 100 TB target is never shuffled.
  */
object MergeInto {
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val srcKeys = source.select(keys.map(source.col): _*).distinct()
    source.unionByName(target.join(srcKeys, keys, "left_anti"))
  }
}
