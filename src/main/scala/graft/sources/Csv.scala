package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion — the other interchange format raw corpora arrive in.
  * Same ingestion discipline as [[Jsonl]]:
  *
  *  - ALWAYS pass the schema: inference costs a full extra pass at
  *    corpus scale and silently widens drifting fields.
  *  - FAILFAST by default: a malformed row fails the curation gate
  *    instead of silently dropping corpus.
  *  - RFC 4180 quoting (`escape = "` → quotes double inside quoted
  *    fields, the dialect every other tool writes) and `multiLine` on
  *    read, so embedded delimiters/newlines in document text round-trip
  *    losslessly. multiLine makes a single file non-splittable — fine
  *    for many medium files (the layout a distributed writer produces),
  *    wrong for one giant file; keep files per-partition sized.
  *
  * Round-trip contract (write → read == identity) is under the DuckDB
  * oracle gate as `src_csv_roundtrip`.
  */
object Csv {

  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(dir)

  def read(spark: SparkSession, dir: String, schema: StructType, strict: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .csv(dir)
}
