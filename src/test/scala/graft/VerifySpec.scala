package graft

import java.nio.file.{Files, Paths}

/** The Verify dump contract: a passing query writes parquet, a THROWING
  * query leaves an `_ERROR.txt` marker in its result dir — the fix for
  * round 6's silent-absence failure mode, pinned so it cannot regress.
  */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  test("a passing query dumps parquet; a throwing query leaves a named error marker") {
    val out = Files.createTempDirectory("graft_verify_spec").toString

    Verify.dumpOne(spark, sfDir, out, "ok_query",
      (s, _) => { import s.implicits._; Seq((1, "a")).toDF("k", "v") })
    assert(spark.read.parquet(s"$out/ok_query").count() == 1L)

    Verify.dumpOne(spark, sfDir, out, "boom_query",
      (_, _) => throw new RuntimeException("synthetic failure"))
    val marker = Paths.get(s"$out/boom_query/_ERROR.txt")
    assert(Files.exists(marker), "throwing query must leave _ERROR.txt")
    val content = Files.readString(marker)
    assert(content.contains("boom_query") && content.contains("synthetic failure"))
    // and the marker dir must NOT read as an empty-but-valid result
    intercept[Exception] { spark.read.parquet(s"$out/boom_query").collect() }
  }
}
