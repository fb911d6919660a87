package graft

import org.apache.spark.sql.functions._

/** Dev tool: wall breakdown of upsert_cdc_lineitem variants — sizes the
  * SortAggregate vs window formulations and the final ORDER BY share
  * before any operator change (guide §1).
  */
object ProfileUpsert {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val keys = Seq("l_orderkey", "l_linenumber")
    val ord = Seq("l_shipdate", "l_extendedprice", "l_partkey", "l_suppkey",
      "l_quantity", "l_discount", "l_tax", "l_returnflag", "l_linestatus")
    def li = Tables(spark, sfDir).lineitem
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[t] $name%-28s pass$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    time("maxby+orderBy (current)") {
      operators.Upsert.latestByKey(li, keys, ord).orderBy("l_orderkey", "l_linenumber")
    }
    time("maxby only") {
      operators.Upsert.latestByKey(li, keys, ord)
    }
    time("window+orderBy") {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(ord.map(c => col(c).desc): _*)
      li.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
        .orderBy("l_orderkey", "l_linenumber")
    }
    time("scan only") { li }
    // high-dup-rate shape (events latest-per-user): does the window's
    // map-side WindowGroupLimit reduce like partial max_by?
    def ev = Tables(spark, sfDir).events
    time("events maxby") {
      operators.Upsert.latestByKey(ev, Seq("user_id"), Seq("ts", "event_id"))
    }
    time("events window") {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
    }
    // plan shape of the window variant (does WindowGroupLimit run in
    // Partial mode before the exchange?)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord.map(c => col(c).desc): _*)
    println(li.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(_.matches("^\\(\\d+\\).*|.*WindowGroupLimit.*|.*mode.*")).mkString("\n"))
    spark.stop()
  }
}
