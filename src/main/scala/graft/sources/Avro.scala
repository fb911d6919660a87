package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Avro ingestion/interchange — the row-oriented container most Kafka
  * archives and schema-registry pipelines land corpus batches in.
  * Spark's built-in avro source (bundled in spark-sql since 4.x) keeps
  * the scan splittable (Avro sync markers → one task per block), so a
  * 100 TB Avro drop parallelizes like parquet even though it is
  * row-major; column pruning happens at decode (no stripe skipping),
  * which is why [[Avro]] is an INGESTION format here — curation output
  * always lands columnar.
  *
  * Same ingestion discipline as [[Csv]]/[[Jsonl]]/[[Orc]]: always pass
  * the schema — no inference pass, no silent widening on writer-schema
  * drift (Avro's own writer schema is validated against it).
  *
  * Round-trip contract (write → read == identity) is under the DuckDB
  * oracle gate as `src_avro_roundtrip`.
  */
object Avro {

  // The short name "avro" is resolved through the spark-avro module's
  // ServiceLoader registration, which not every Spark distribution
  // bundles; the implementation itself ships inside spark-sql. The
  // fully-qualified FileFormat class bypasses the registry, so this
  // works on any distribution that has the classes at all.
  private val Format = "org.apache.spark.sql.avro.AvroFileFormat"

  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").format(Format).save(dir)

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(Format).load(dir)
}
