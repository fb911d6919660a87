package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) ingestion — the interchange format
  * most raw training corpora arrive in. Thin by design: Spark's json
  * source IS the distributed reader; what this adds is the ingestion
  * discipline a 100 TB pipeline needs:
  *
  *  - ALWAYS pass the schema: schema inference reads the entire input
  *    once before the real scan (a full extra pass at corpus scale) and
  *    silently widens/nulls drifting fields.
  *  - `strict = true` (FAILFAST) fails the job on the first malformed
  *    line — the right default for a curation gate, where a silently
  *    dropped record is corpus loss. `strict = false` (PERMISSIVE)
  *    keeps malformed lines as nulls + `_corrupt_record` for quarantine
  *    flows.
  *
  * The round-trip contract (write → read == identity on the schema'd
  * columns) is under the DuckDB oracle gate as `src_jsonl_roundtrip`.
  */
object Jsonl {

  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  def read(spark: SparkSession, dir: String, schema: StructType, strict: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .json(dir)
}
