package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (Queries.benchQueries) at
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A small warmup query
  * first-touches the JIT + parquet footers so per-query times measure the
  * operators, not JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + exercise codegen/shuffle machinery AND
    // the noop write path once (otherwise the first timed query pays the
    // write-path class-loading + codegen bill)
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/documents.parquet").write.format("noop").mode("overwrite").save()

    // each query is timed `runs` times in one JVM; the reported time is
    // the min (steady state — what a long-lived cluster actually sees,
    // JIT + code cache warm), with the cold first run reported alongside
    val runs   = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    // dev loop: SPARK_GRAFT_BENCH_ONLY=substring times a subset in
    // isolation (the driver never sets it, so its runs are unaffected)
    val only   = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = Queries.benchQueries
      .filter(q => only.forall(q.name.contains))
      .map { q =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop-format write: materializes every row INCLUDING final sorts
        // (a bare .count() lets EliminateSorts drop top-level ORDER BYs,
        // under-measuring sort-heavy queries)
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            failed += q.name
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (q.name, times.min, times.head)
    }
    // two-decimal formatting keeps the final JSON line under ~1.8 KB: the
    // harness that collects this output stores only the LAST 2000 chars, and
    // a full-precision line with per-query cold times (~4.5 KB) gets its
    // `{"metric":...` head truncated away, making the line unparseable
    def f2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // the registry outgrew the 2000-char tail the collecting harness
    // keeps (round 6: a 3.6 KB line lost its '{"metric"' head and parsed
    // as nothing), so the compact line carries only the SLOWEST queries
    // — the ones a perf review reads — plus n_queries for context; the
    // full per-query map stays on the bench-detail line and in
    // BENCH_LOCAL.json
    val slowest = results.sortBy(-_._2).take(40)
    val qs    = slowest.map { case (k, v, _) => "\"" + k + "\":" + f2(v) }.mkString("{", ",", "}")
    val cold  = results.map { case (k, _, c) => "\"" + k + "\":" + c }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val coldTotal = results.map(_._3).sum
    // a failed query records a (meaningless, tiny) time — list failures
    // explicitly so the JSON can never silently pass as an improvement
    val failedJson = failed.take(20).map("\"" + _ + "\"").mkString("[", ",", "]")
    // full-precision detail first (prefixed, so it can't be mistaken for the
    // metric line), then stop Spark so shutdown logs flush BEFORE the final
    // compact line — which must be the last stdout of the run
    println(s"""bench-detail: {"runs":$runs,"cold_total":$coldTotal,"cold_queries":$cold,"steady_queries":${results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")}}""")
    spark.stop()
    println(s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qs,"n_queries":${results.size},"sf":"$sfDir","runs":$runs,"cold_total":${f2(coldTotal)},"failed":$failedJson,"n_failed":${failed.size}}""")
  }
}
