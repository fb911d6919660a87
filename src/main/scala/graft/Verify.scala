package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Dump one query result as parquet; on ANY failure leave a loud
    * `_ERROR.txt` marker in the query's result dir. A thrown query must
    * not silently vanish from the correctness board (round 6: 45 rows
    * absent looked like "not registered") — the marker makes the
    * driver's read fail BY NAME and gives a human diffing outDir the
    * stack head.
    */
  private[graft] def dumpOne(spark: SparkSession, sfDir: String, outDir: String,
      name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
    try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    catch { case e: Throwable =>
      System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      try {
        val errDir = Paths.get(s"$outDir/$name")
        Files.createDirectories(errDir)
        Files.writeString(errDir.resolve("_ERROR.txt"), s"$name\n${e.toString}\n")
      } catch { case _: Throwable => () }
    }
    finally
      // release per-query persisted aggregates (q15-style reused
      // relations persist inside query bodies with no post-action hook)
      // — without this a 250+-entry dump accumulates dead cached blocks
      // in the block manager (§5)
      try spark.catalog.clearCache() catch { case _: Throwable => () }
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: only dump queries whose name contains it (dev
    // loop; the driver always passes exactly two args)
    val only = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(name.contains) }
      .foreach { case (name, fn) => dumpOne(spark, sfDir, outDir, name, fn) }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
