package graft

import graft.streaming.StreamSpec
import java.nio.file.Files

/** Spec-driven curation bootstrap: the training-data counterpart of the
  * stream runner's env/file spec boot.
  */
class CurateRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("CurateRunner runs a spec-configured pipeline end to end") {
    val base = Files.createTempDirectory("graft_curate").toString
    // corpus: one good doc, one duplicate of it, one contaminated doc
    val good = "the quick brown fox jumps over the lazy dog and keeps on running far away"
    val contaminated = "benchmark sentence alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq((1L, good), (2L, good), (3L, contaminated))
      .toDF("doc_id", "text").write.parquet(s"$base/in")
    Seq((100L, contaminated)).toDF("doc_id", "text").write.parquet(s"$base/bench")

    val spec = StreamSpec.parse(
      s"""curation:
         |  input: $base/in
         |  output: $base/out
         |  idColumn: doc_id
         |  textColumn: text
         |  dedup: exact
         |  decontaminateAgainst: $base/bench
         |""".stripMargin)
    val report = CurateRunner.run(spark, spec)
    assert(report.inputDocs == 3)
    assert(report.keptDocs == 1, "dup collapsed, contaminated doc dropped")
    val kept = spark.read.parquet(s"$base/out").select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
    assert(report.jsonLine.contains("\"kept_docs\":1"))
  }

  test("spec errors are bootstrap failures (exit 1); run failures map to exit 2") {
    val noInput = StreamSpec.parse("curation:\n  output: /tmp/x\n")
    val boot = intercept[IllegalArgumentException](CurateRunner.run(spark, noInput))
    assert(graft.streaming.StreamRunner.exitCodeFor(boot) == 1)

    val badDedup = StreamSpec.parse("curation:\n  dedup: frobnicate\n")
    intercept[IllegalArgumentException](CurateRunner.config(badDedup))

    val missingPath = StreamSpec.parse(
      "curation:\n  input: /nonexistent/graft\n  output: /tmp/x\n")
    val run = intercept[graft.streaming.StreamFailException](CurateRunner.run(spark, missingPath))
    assert(graft.streaming.StreamRunner.exitCodeFor(run) == 2)
  }

  test("spec from the environment variable boots identically") {
    val spec = CurateRunner.fromEnv(Map(
      CurateRunner.SpecEnvVar -> "curation:\n  minQuality: 0.5\n  dedup: near\n"))
    val cfg = CurateRunner.config(spec)
    assert(cfg.minQuality == 0.5)
    assert(cfg.dedup == graft.operators.CurationPipeline.NearDedup)
    intercept[IllegalArgumentException](CurateRunner.fromEnv(Map.empty))
  }
}
