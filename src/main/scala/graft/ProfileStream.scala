package graft

import org.apache.spark.sql.functions._

/** Dev tool: phase breakdown of stream_merge_mor / stream_upsert_eqdelete
  * (the board's most expensive untouched family) — where do the ~3-4 s
  * go: seed write, stream machinery, MERGE, or the final read?
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def phase[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s  jobs=${jobs.get() - j0}")
      r
    }
    spark.read.parquet(s"$sfDir/orders.parquet").write.format("noop").mode("overwrite").save()
    val warehouse = java.nio.file.Files.createTempDirectory("graft_profstream_wh").toString
    spark.conf.set("spark.sql.catalog.profcat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.profcat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS profcat.db")
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      val tbl = s"profcat.db.t$pass"
      val seed = Tables(spark, sfDir).orders
        .where("o_orderkey % 4 <> 0")
        .selectExpr(
          "o_orderkey", "o_custkey",
          "CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice",
          "o_orderstatus AS status", "CAST(1 AS BIGINT) AS version")
      phase("seedTarget") {
        graft.streaming.StreamMerge.seedTarget(spark, tbl, seed, Seq("o_orderkey"))
      }
      val work = java.nio.file.Files.createTempDirectory("graft_profsmm").toString
      phase("churn blob write") {
        Tables(spark, sfDir).orders
          .where("o_orderkey % 2 = 0")
          .selectExpr(
            "o_orderkey", "o_custkey",
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 3 AS DECIMAL(12,2)) AS totalprice",
            "'X' AS status", "CAST(2 AS BIGINT) AS version")
          .coalesce(1).write.parquet(s"$work/src")
      }
      val schema = phase("schema read")(spark.read.parquet(s"$work/src").schema)
      phase("runAvailableNow") {
        graft.streaming.StreamMerge.runAvailableNow(spark, schema, graft.streaming.StreamMerge.Config(
          sourceDir = s"$work/src", table = tbl,
          tableDir = s"$warehouse/db/t$pass",
          checkpointDir = s"$work/ckpt",
          primaryKeys = Seq("o_orderkey"), versionCols = Seq("version")))
      }
      phase("final select+noop") {
        spark.sql(s"""SELECT o_orderkey, o_custkey,
          CAST(totalprice AS DOUBLE) AS totalprice, status, version
          FROM $tbl ORDER BY o_orderkey""")
          .write.format("noop").mode("overwrite").save()
      }
      // split the streaming machinery from the MERGE itself: same batch,
      // same (fresh) seeded table, but idempotentMerge called directly
      val tbl2 = s"profcat.db.d$pass"
      graft.streaming.StreamMerge.seedTarget(spark, tbl2, seed, Seq("o_orderkey"))
      val resolved = phase("resolveBuckets") {
        graft.streaming.StreamMerge.resolveBuckets(spark, tbl2, graft.streaming.StreamMerge.Auto)
      }
      val batch = {
        val keyed = graft.operators.MergeKey.withMergeKey(
          spark.read.schema(schema).parquet(s"$work/src"), Seq("o_orderkey"))
        resolved.n.fold(keyed)(n =>
          keyed.withColumn(graft.streaming.StreamMerge.BucketColumnName,
            graft.streaming.StreamMerge.bucketExpr(n)))
      }
      phase("direct idempotentMerge") {
        graft.streaming.StreamMerge.idempotentMerge(tbl2,
          Seq(graft.operators.MergeKey.ColumnName), Seq("version"),
          resolved.n.filter(_ => resolved.prune))(batch, 0L)
      }
    }
    spark.stop()
  }
}
