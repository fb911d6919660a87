package graft.operators

import org.apache.spark.sql.DataFrame

/** Source column name mapping, the reference's `useNameMapping` option
  * (/root/reference/stream-spec-yaml-example.yaml:88): map physical
  * parquet column names to logical target names at read time. Pure
  * projection — free at any scale.
  */
object NameMapping {
  def applyMapping(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.select(df.columns.map(c => df.col(c).as(mapping.getOrElse(c, c))).toIndexedSeq: _*)
}
