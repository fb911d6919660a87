package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC ingestion/interchange — the columnar format Hive-era lakes hold
  * corpus archives in. Spark's native vectorized ORC reader gives the
  * same pushdown/pruning surface as parquet (predicate pushdown,
  * column pruning, min/max stripe skipping), so at 100 TB an ORC scan
  * plans identically to a parquet scan — no conversion pass needed
  * before curation.
  *
  * Same ingestion discipline as [[Csv]]/[[Jsonl]]: always pass the
  * schema (no inference pass over the corpus; no silent widening on
  * drift). ORC is self-describing, so the schema acts as a contract —
  * a mismatching file fails the read instead of nulling columns.
  *
  * Round-trip contract (write → read == identity) is under the DuckDB
  * oracle gate as `src_orc_roundtrip`.
  */
object Orc {

  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)
}
