package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale measurement for the Graft table format's commit path: the
  * MOR delete-file lifecycle under sustained change capture. The
  * per-query bench covers one MERGE; what it cannot show is the
  * ACCUMULATION regime — a streaming upsert target takes a MOR merge
  * every batch, each adding position-delete files, and scan cost grows
  * with the live delete set until compaction folds it. This tool
  * measures exactly that curve at a given scale:
  *
  *   1. load `orders` from <sfDir> into a merge-on-read table;
  *   2. run R MOR merge rounds (each updates a disjoint key slice —
  *      the worst case: every data file accrues deletes);
  *   3. after each round, time a full read THROUGH the deletes;
  *   4. compact, then time the same read on the folded table.
  *
  * Output: one JSON line per phase, machine-readable for the
  * BENCH_SF1 addendum. Run at 1×/10×/30× dirs for the curvature.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.CatalogScale <sfDir> <rounds>
  */
object CatalogScale {

  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 6
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark  = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warehouse = java.nio.file.Files.createTempDirectory("graft_catalog_scale").toString
    spark.conf.set("spark.sql.catalog.graftscale", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftscale.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftscale.db")
    val tbl = "graftscale.db.morscale"
    val tableDir = s"$warehouse/db/morscale"

    def timed[A](op: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = op; (a, (System.nanoTime() - t0) / 1e9)
    }
    def f2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def readAll(): Long =
      spark.sql(s"SELECT sum(o_custkey), count(*) FROM $tbl").head().getLong(1)

    spark.sql(s"""CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT,
      totalprice DECIMAL(12,2), status STRING)
      TBLPROPERTIES ('graft.merge.mode' = 'merge-on-read')""")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice", "o_orderstatus AS status")
    val (_, loadSec) = timed(orders.writeTo(tbl).append())
    val total = readAll()
    println(s"""{"phase":"load","rows":$total,"sec":${f2(loadSec)}}""")

    val io = new graft.catalog.GraftManifestIO(
      new org.apache.hadoop.fs.Path(tableDir), graft.catalog.GraftConf.hadoop)
    for (r <- 1 to rounds) {
      // each round updates a different residue class: disjoint row sets,
      // but the keys INTERLEAVE through every data file, so each round's
      // position-delete files target (almost) every live data file —
      // the delete set a scan must apply grows round over round
      orders.where(s"o_orderkey % ${rounds + 1} = $r")
        .selectExpr("o_orderkey", "o_custkey",
          s"CAST(totalprice * 2 AS DECIMAL(12,2)) AS totalprice", s"'U$r' AS status")
        .createOrReplaceTempView("morscale_src")
      val (_, mergeSec) = timed(spark.sql(
        s"""MERGE INTO $tbl t USING morscale_src s ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET t.totalprice = s.totalprice, t.status = s.status"""))
      val (n, readSec) = timed(readAll())
      require(n == total, s"round $r lost rows: $n != $total")
      val snap = io.currentSnapshot().get
      println(s"""{"phase":"merge","round":$r,"merge_sec":${f2(mergeSec)},"read_sec":${f2(readSec)},"data_files":${snap.files.size},"delete_files":${snap.deletes.size}}""")
    }

    val ((before, after), compactSec) =
      timed(graft.catalog.GraftMaintenance.compact(spark, tableDir, smallBytes = 1L << 30))
    val (n2, postReadSec) = timed(readAll())
    require(n2 == total, s"compaction lost rows: $n2 != $total")
    val post = io.currentSnapshot().get
    println(s"""{"phase":"compact","sec":${f2(compactSec)},"files_before":$before,"files_after":$after,"delete_files_after":${post.deletes.size},"read_sec":${f2(postReadSec)}}""")

    // phase 4: the production topology — a change-capture STREAM and an
    // out-of-band batch MERGE (backfill) racing on one MOR table through
    // the OCC commit loop. Disjoint residue classes make the expected
    // final state checkable; the phase proves conflict-retry liveness
    // and no lost updates at scale, and times both writers under
    // contention.
    val conc = "graftscale.db.morconc"
    val concDir = s"$warehouse/db/morconc"
    spark.sql(s"""CREATE TABLE $conc (o_orderkey BIGINT, o_custkey BIGINT,
      totalprice DECIMAL(12,2), status STRING, version BIGINT, arcane_merge_key STRING)
      TBLPROPERTIES ('graft.merge.mode' = 'merge-on-read')""")
    val seedDf = orders.selectExpr("o_orderkey", "o_custkey", "totalprice", "status",
      "CAST(0 AS BIGINT) AS version")
    graft.operators.MergeKey.withMergeKey(seedDf, Seq("o_orderkey")).writeTo(conc).append()
    val work = java.nio.file.Files.createTempDirectory("graft_conc").toString
    val streamRounds = 4
    for (b <- 1 to streamRounds)
      orders.where("o_orderkey % 16 = 0")
        .selectExpr("o_orderkey", "o_custkey", "totalprice", s"'S$b' AS status",
          s"CAST($b AS BIGINT) AS version")
        .coalesce(1).write.mode("append").parquet(s"$work/src")
    val concSchema = spark.read.parquet(s"$work/src").schema
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext = scala.concurrent.ExecutionContext.global
    val t0c = System.nanoTime()
    val streamF = Future {
      graft.streaming.StreamMerge.runAvailableNow(spark, concSchema,
        graft.streaming.StreamMerge.Config(
          sourceDir = s"$work/src", table = conc, tableDir = concDir,
          checkpointDir = s"$work/ckpt",
          primaryKeys = Seq("o_orderkey"), versionCols = Seq("version"),
          maxFilesPerTrigger = Some(1)))
      (System.nanoTime() - t0c) / 1e9
    }
    val batchSec = {
      val b0 = System.nanoTime()
      for (r <- 1 to streamRounds) {
        orders.where("o_orderkey % 16 = 1")
          .selectExpr("o_orderkey", "o_custkey", "totalprice", s"'B$r' AS status",
            s"CAST($r AS BIGINT) AS version")
          .createOrReplaceTempView("morconc_src")
        spark.sql(s"""MERGE INTO $conc t USING morconc_src s ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED THEN UPDATE SET t.status = s.status, t.version = s.version""")
      }
      (System.nanoTime() - b0) / 1e9
    }
    val streamSec = Await.result(streamF, 30.minutes)
    val concRows = spark.sql(s"SELECT count(*) FROM $conc").head().getLong(0)
    val sOk = spark.sql(
      s"SELECT count(*) FROM $conc WHERE o_orderkey % 16 = 0 AND status = 'S$streamRounds'").head().getLong(0)
    val bOk = spark.sql(
      s"SELECT count(*) FROM $conc WHERE o_orderkey % 16 = 1 AND status = 'B$streamRounds'").head().getLong(0)
    val sAll = spark.sql(s"SELECT count(*) FROM $conc WHERE o_orderkey % 16 = 0").head().getLong(0)
    val bAll = spark.sql(s"SELECT count(*) FROM $conc WHERE o_orderkey % 16 = 1").head().getLong(0)
    require(concRows == total, s"concurrent writers lost/duplicated rows: $concRows != $total")
    require(sOk == sAll, s"stream updates lost under concurrency: $sOk of $sAll")
    require(bOk == bAll, s"batch updates lost under concurrency: $bOk of $bAll")
    println(s"""{"phase":"concurrent","rows":$concRows,"stream_rounds":$streamRounds,"batch_rounds":$streamRounds,"stream_sec":${f2(streamSec)},"batch_sec":${f2(batchSec)},"lost_updates":0}""")
    spark.stop()
  }
}
