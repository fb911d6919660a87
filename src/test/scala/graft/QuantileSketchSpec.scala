package graft

import graft.operators.Sketches
import graft.plans.KllExpressions._
import org.apache.spark.sql.functions._

/** KLL quantile sketch family (the third mergeable sketch next to HLL
  * ndv and frequent-items): exact-regime order-statistic equality, the
  * normalized-rank-error guarantee under compaction, the
  * persist-partials/rollup pattern, and exact n accounting.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime (n <= k): INCLUSIVE quantiles are the ceil(q*n)-th order statistics") {
    val cust  = Tables(spark, sfDir).customer
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Sketches.approxQuantiles(cust, Seq("c_nationkey"), "c_acctbal", probs, k = 4096)
      .collect().map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getSeq[Double](2))).toMap
    val byNation = cust.select(col("c_nationkey").cast("long"), col("c_acctbal")).as[(Long, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((nation, vals) <- byNation) {
      val (n, qs) = got(nation)
      assert(n == vals.length, s"nation $nation: n=$n vs ${vals.length}")
      for ((p, q) <- probs.zip(qs)) {
        val idx = math.max(1, math.ceil(p * vals.length).toLong).toInt
        assert(q == vals(idx - 1),
          s"nation $nation p=$p: sketch $q vs order statistic ${vals(idx - 1)}")
      }
    }
  }

  test("approximate regime: estimates honor the sketch's own normalized rank error bound") {
    val prices = Tables(spark, sfDir).lineitem.select("l_extendedprice")
    val n      = prices.count()
    val k      = 200 // default accuracy tier; ~6k rows force real compaction
    val probs  = Seq(0.1, 0.5, 0.9, 0.99)
    val qs = Sketches.approxQuantiles(prices.withColumn("g", lit(1)), Seq("g"),
        "l_extendedprice", probs, k = k)
      .select("quantiles").as[Seq[Double]].head()
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)
    val sorted = prices.as[Double].collect().sorted
    for ((p, est) <- probs.zip(qs)) {
      // the true rank of the estimated quantile must be within eps of p
      val below = sorted.count(_ <= est).toDouble / n
      val strictlyBelow = sorted.count(_ < est).toDouble / n
      assert(strictlyBelow - eps <= p && p <= below + eps,
        s"p=$p est=$est true-rank in [$strictlyBelow, $below] exceeds eps=$eps")
    }
  }

  test("partial sketches roll up to the direct answer (exact regime) with exact n accounting") {
    val cust  = Tables(spark, sfDir).customer
    val probs = Seq(0.25, 0.5, 0.9)
    val partials = Sketches.partialQuantileSketches(
      cust, Seq("c_nationkey"), Seq("c_mktsegment"), "c_acctbal", k = 4096)
    // partials are one sketch per (nation, segment)
    assert(partials.count() ==
      cust.select("c_nationkey", "c_mktsegment").distinct().count())
    val rolled = Sketches.mergeQuantileSketches(partials, Seq("c_nationkey"), probs, k = 4096)
      .collect().map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getSeq[Double](2))).toMap
    val direct = Sketches.approxQuantiles(cust, Seq("c_nationkey"), "c_acctbal", probs, k = 4096)
      .collect().map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(rolled == direct, "union of uncompacted partials must equal the direct sketch")
    // n is a counter, not an estimate: rollup n == group size exactly
    val sizes = cust.groupBy(col("c_nationkey").cast("long")).count().as[(Long, Long)].collect().toMap
    for ((nation, (n, _)) <- rolled) assert(n == sizes(nation))
  }

  test("sketch bytes survive a parquet round-trip and keep answering (the persisted-partial contract)") {
    val cust = Tables(spark, sfDir).customer
    val dir  = java.nio.file.Files.createTempDirectory("kll_partials").toString
    Sketches.partialQuantileSketches(cust, Seq("c_nationkey"), Seq("c_mktsegment"),
      "c_acctbal", k = 4096).write.mode("overwrite").parquet(dir)
    val rolled = Sketches.mergeQuantileSketches(
        spark.read.parquet(dir), Seq("c_nationkey"), Seq(0.5), k = 4096)
      .collect().map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](2).head).toMap
    val direct = Sketches.approxQuantiles(cust, Seq("c_nationkey"), "c_acctbal", Seq(0.5), k = 4096)
      .collect().map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](2).head).toMap
    assert(rolled == direct)
  }

  test("SQL surface: kll_sketch_agg/kll_union_agg/kll_quantiles/kll_n resolve and agree with the Column API") {
    Tables(spark, sfDir).customer.createOrReplaceTempView("kll_cust")
    val viaSql = spark.sql("""
      SELECT c_nationkey, kll_n(sk) AS n, kll_quantiles(sk, array(0.5D)) AS q
      FROM (SELECT c_nationkey, kll_sketch_agg(CAST(c_acctbal AS DOUBLE), 4096) AS sk
            FROM kll_cust GROUP BY c_nationkey)
    """).collect().map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getSeq[Double](2))).toMap
    val viaCol = Sketches.approxQuantiles(Tables(spark, sfDir).customer,
        Seq("c_nationkey"), "c_acctbal", Seq(0.5), k = 4096)
      .collect().map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(viaSql == viaCol)
    // union through SQL over sharded partials agrees too
    val viaUnion = spark.sql("""
      SELECT c_nationkey, kll_quantiles(kll_union_agg(sk, 4096), array(0.5D)) AS q
      FROM (SELECT c_nationkey, c_mktsegment, kll_sketch_agg(CAST(c_acctbal AS DOUBLE), 4096) AS sk
            FROM kll_cust GROUP BY c_nationkey, c_mktsegment)
      GROUP BY c_nationkey
    """).collect().map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1)).toMap
    assert(viaUnion == viaCol.view.mapValues(_._2).toMap)
  }

  test("streaming: per-micro-batch KLL partials accumulate and the union converges to the batch answer") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // the persisted-partial pattern under ingestion: each micro-batch
    // contributes ONE sketch row per group; any later reader unions.
    // localCheckpoint truncates lineage so k batches don't nest k plans
    var partials = Seq.empty[(Int, Array[Byte])].toDF("g", "sketch").localCheckpoint()
    val input = MemoryStream[(Int, Double)]
    val q = input.toDF().toDF("g", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val p = batch.groupBy("g").agg(kllSketchAgg(col("v"), 1024).as("sketch"))
        partials = partials.unionByName(p).localCheckpoint()
        ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    val all = (1 to 300).map(i => (i % 3, (i * 37 % 101).toDouble))
    all.grouped(100).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
    q.stop()

    val rolled = Sketches.mergeQuantileSketches(partials, Seq("g"), Seq(0.25, 0.5, 0.9), k = 1024)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    val direct = Sketches.approxQuantiles(all.toDF("g", "v"), Seq("g"), "v",
        Seq(0.25, 0.5, 0.9), k = 1024)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(rolled == direct,
      s"union over streamed partials must equal the one-shot batch sketch: $rolled vs $direct")
  }

  test("streaming windowed quantiles: KLL aggregates as checkpointed state per event-time window") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // pins that the custom TypedImperativeAggregate serializes/merges
    // correctly as STREAMING state across micro-batches; exact regime
    // (n ≤ k) so the closed window's quantiles are checkable values
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(kllSketchAgg(col("v"), 256).as("sk"))
      .select(col("window.start").as("bucket"), kllN(col("sk")).as("n"),
        kllQuantiles(col("sk"), array(lit(0.5), lit(1.0))).as("q"))
    val q = agg.writeStream.format("memory").queryName("kll_sink")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    // two batches land in the SAME window: sketch state must merge
    input.addData((t("2024-01-01 00:01:00"), 10.0), (t("2024-01-01 00:02:00"), 20.0))
    q.processAllAvailable()
    input.addData((t("2024-01-01 00:03:00"), 30.0), (t("2024-01-01 00:04:00"), 40.0))
    q.processAllAvailable()
    input.addData((t("2024-01-01 01:00:00"), 99.0)) // close the window
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("kll_sink")
      .as[(java.sql.Timestamp, Long, Seq[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (n, qs) = rows(t("2024-01-01 00:00:00"))
    assert(n == 4L, s"all four rows of the window must reach one sketch: $rows")
    assert(qs == Seq(20.0, 40.0), // ceil(0.5*4)=2nd of {10,20,30,40}; max
      s"closed-window quantiles wrong: $qs")
  }

  test("nulls are skipped; an all-null group yields null quantiles but a sketch row") {
    val df = Seq(
      (1, Some(10.0)), (1, None), (1, Some(20.0)), (2, None), (2, None)
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(kllSketchAgg(col("v"), 64).as("sk"))
      .select(col("g"), kllN(col("sk")).as("n"),
        kllQuantiles(col("sk"), array(lit(0.5))).as("q"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), Option(r.getSeq[Double](2)))).toMap
    assert(out(1) == ((2L, Some(Seq(10.0)))), s"got ${out(1)}") // ceil(0.5*2)=1 -> 1st of {10,20}
    assert(out(2)._1 == 0L && out(2)._2.isEmpty, "all-null group: n=0, null quantiles")
  }
}
