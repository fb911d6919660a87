package graft

import graft.operators.CurationPipeline
import graft.streaming.StreamSpec
import graft.streaming.StreamSpec.Mapping
import org.apache.spark.sql.SparkSession

/** Spec-driven bootstrap for the CURATION side of the engine — the
  * counterpart of [[graft.streaming.StreamRunner]]: where the stream
  * runner boots the reference's CDC pipeline from `STREAMCONTEXT__SPEC`,
  * this boots a corpus-curation run (quality → language → repetition →
  * compression → rarity → dedup → decontaminate → pack) from
  * `CURATECONTEXT__SPEC`, so a training-data pipeline is deployable as
  * `spark-submit --class graft.CurateMain` plus a YAML spec — no Scala.
  *
  * Exit codes mirror the stream runner's discipline: spec/bootstrap
  * errors (missing paths, unknown dedup mode) exit 1; a curation run
  * that started and failed exits 2.
  */
object CurateRunner {

  val SpecEnvVar = "CURATECONTEXT__SPEC"

  def fromEnv(env: Map[String, String] = sys.env): Mapping =
    env.get(SpecEnvVar).map(StreamSpec.parse).getOrElse(
      throw new IllegalArgumentException(s"$SpecEnvVar not set"))

  /** `curation.*` → [[CurationPipeline.Config]] (decontamination source
    * is attached in [[run]] — it needs a SparkSession to read).
    */
  def config(spec: Mapping): CurationPipeline.Config = {
    val c = "curation"
    val dedup = StreamSpec.str(spec, c, "dedup").getOrElse("exact") match {
      case "none"  => CurationPipeline.NoDedup
      case "exact" => CurationPipeline.ExactDedup
      case "near"  => CurationPipeline.NearDedup
      case other   => throw new IllegalArgumentException(s"unknown curation.dedup mode: $other")
    }
    CurationPipeline.Config(
      minQuality = StreamSpec.double(spec, c, "minQuality").getOrElse(0.0),
      languages = StreamSpec.strSeq(spec, c, "languages").toSet,
      maxDup3GramFrac = StreamSpec.double(spec, c, "maxDup3GramFrac").getOrElse(1.0),
      compressRatioBounds = for {
        lo <- StreamSpec.double(spec, c, "compressRatioLo")
        hi <- StreamSpec.double(spec, c, "compressRatioHi")
      } yield (lo, hi),
      maxRareTokenFrac = StreamSpec.double(spec, c, "maxRareTokenFrac").getOrElse(1.0),
      dedup = dedup,
      useBloomDecontamination =
        StreamSpec.bool(spec, c, "useBloomDecontamination").getOrElse(true),
      decontaminateShingleN = StreamSpec.int(spec, c, "decontaminateShingleN").getOrElse(3),
      tokenBudget = StreamSpec.long(spec, c, "tokenBudget")
    )
  }

  final case class Report(inputDocs: Long, keptDocs: Long, output: String) {
    def jsonLine: String =
      s"""{"input_docs":$inputDocs,"kept_docs":$keptDocs,"output":"$output"}"""
  }

  /** Read the input corpus, run the configured stages, write the curated
    * corpus, and return the in/out counts. Failures after bootstrap are
    * wrapped as [[graft.streaming.StreamFailException]] → exit 2.
    */
  def run(spark: SparkSession, spec: Mapping): Report = {
    val c = "curation"
    def required(key: String): String = StreamSpec.str(spec, c, key).getOrElse(
      throw new IllegalArgumentException(s"spec missing curation.$key"))
    val input   = required("input")
    val output  = required("output")
    val idCol   = StreamSpec.str(spec, c, "idColumn").getOrElse("doc_id")
    val textCol = StreamSpec.str(spec, c, "textColumn").getOrElse("text")
    val cfg = config(spec).copy(
      decontaminateAgainst =
        StreamSpec.str(spec, c, "decontaminateAgainst").map(spark.read.parquet))

    try {
      val docs = spark.read.parquet(input)
      CurationPipeline.run(docs, idCol, textCol, cfg)
        .write.mode("overwrite").parquet(output)
      Report(docs.count(), spark.read.parquet(output).count(), output)
    } catch {
      case t: Throwable =>
        throw new graft.streaming.StreamFailException(s"curation run failed: ${t.getMessage}", t)
    }
  }
}

/** `spark-submit --class graft.CurateMain [specFile]` — spec from the
  * file argument or `CURATECONTEXT__SPEC`; prints the one-line report
  * to stdout; exit 0 / 1 (bootstrap) / 2 (run failed).
  */
object CurateMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", 32)
      // unsound in Spark 4.1 — see GraftSession for the full account
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    val code =
      try {
        val spec = args.headOption.map(StreamSpec.loadFile).getOrElse(CurateRunner.fromEnv())
        println(CurateRunner.run(spark, spec).jsonLine)
        0
      } catch {
        case t: Throwable =>
          System.err.println(s"[graft] curation failed: ${t.getMessage}")
          graft.streaming.StreamRunner.exitCodeFor(t)
      } finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
