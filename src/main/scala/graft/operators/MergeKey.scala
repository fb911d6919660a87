package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge-key derivation.
  *
  * The reference computes an `arcane_merge_key` column from the configured
  * `source.configuration.primaryKeys` (see /root/reference
  * stream-spec-yaml-example.yaml:85-87 and the integration test's target
  * schema at src/test/scala/tests/IntegrationTests.scala:174). We define it
  * as the md5 hex digest of the '|'-joined string form of the primary key
  * columns: deterministic, engine-portable, and codegen'd end-to-end
  * (md5/concat_ws are built-in Catalyst expressions — no UDF).
  */
object MergeKey {
  val ColumnName = "arcane_merge_key"

  def keyExpr(pks: Seq[Column]): Column =
    md5(concat_ws("|", pks.map(_.cast("string")): _*))

  /** Append `arcane_merge_key` derived from `pks` (in order). */
  def withMergeKey(df: DataFrame, pks: Seq[String]): DataFrame =
    df.withColumn(ColumnName, keyExpr(pks.map(df.col)))
}
