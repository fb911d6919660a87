package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** XML ingestion — feeds like arXiv/PubMed/Wikipedia dumps arrive as
  * XML. Spark 4's built-in xml source (the former spark-xml, merged
  * upstream) splits files on the row tag, so a multi-GB dump still
  * fans out across executors instead of pinning one task per file.
  *
  * Ingestion-only discipline: explicit schema (no inference pass — XML
  * inference reads the whole corpus TWICE at scale), explicit rowTag.
  * Values are XML-escaped by the writer, so arbitrary corpus text
  * (including `<`, `&`, quotes) survives the trip; XML 1.0 forbids
  * most control characters, which the curation path strips anyway
  * (`text_scrub`) before any XML export.
  *
  * Round-trip contract (write → read == identity) is under the DuckDB
  * oracle gate as `src_xml_roundtrip`.
  */
object Xml {

  def write(df: DataFrame, dir: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite").format("xml")
      .option("rowTag", rowTag).option("rootTag", "rows")
      .save(dir)

  def read(spark: SparkSession, dir: String, schema: StructType, rowTag: String = "row"): DataFrame =
    spark.read.schema(schema).format("xml").option("rowTag", rowTag).load(dir)
}
