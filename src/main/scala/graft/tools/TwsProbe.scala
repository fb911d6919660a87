package graft.tools

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Environment probe + isolated-JVM validation for Spark 4's
  * transformWithState + RocksDB state store (SURVEY §9: the provider's
  * local-FS op rate deadlocked this container's JDK process-pipe in
  * round 4 — Hadoop RawLocalFileSystem shells out to `chmod`/`readlink`
  * and Shell.runCommand's pipe close blocks forever; the hazard is
  * LOAD-DEPENDENT, so a light single-purpose JVM passes where the
  * full test-suite JVM hangs). Run UNDER AN EXTERNAL TIMEOUT; prints
  * one `TWS-OK <scenario>` line per validated scenario and `TWS-OK
  * all` on success. Scenarios: raw ValueState count, TwsDedup
  * first-seen, checkpoint-restart resume (all TimeMode.None), and —
  * opt-in `--ttl`, still deadlock-prone here — TTL re-admission.
  * Re-run after container/JDK changes before moving TwsDedupSpec off
  * its GRAFT_TWS_SPEC gate.
  */
object TwsProbe {

  /** Running per-key count with ValueState — the smallest processor
    * that exercises init/read/update through the state store.
    */
  final class CountProcessor extends StatefulProcessor[String, (String, Long), (String, Long)] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timers: TimerValues): Iterator[(String, Long)] = {
      val prev = if (count.exists()) count.get() else 0L
      val next = prev + rows.size
      count.update(next)
      Iterator.single((key, next))
    }
  }

  def main(args: Array[String]): Unit = {
    val spark: org.apache.spark.sql.SparkSession = graft.GraftSession.builder("local[4]", 4)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.TwsDedup
    import graft.streaming.TwsDedup.Keyed
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ckpt(n: String) = java.nio.file.Files.createTempDirectory(n).toString

    // scenario 1: raw API — ValueState running count
    {
      val input = MemoryStream[(String, Long)]
      val out: Dataset[(String, Long)] = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update())
      val q = out.writeStream
        .format("memory").queryName("tws_probe").outputMode("update")
        .option("checkpointLocation", ckpt("tws_probe_ckpt")).start()
      try {
        input.addData(("a", 1L), ("a", 2L), ("b", 3L)); q.processAllAvailable()
        input.addData(("a", 4L), ("c", 5L)); q.processAllAvailable()
      } finally q.stop()
      // batch1: a->2, b->1; batch2: a->3, c->1 => sink rows sum 7
      val sum = spark.sql("SELECT sum(_2) FROM tws_probe").head().getLong(0)
      require(sum == 7L, s"count processor: expected 7, got $sum")
      println("TWS-OK count=7")
    }

    // scenario 2: TwsDedup first-seen across batches
    {
      val input = MemoryStream[Keyed]
      val q = TwsDedup.firstSeenOnly(spark, input.toDS())
        .writeStream.format("memory").queryName("tws_dedup").outputMode("append")
        .option("checkpointLocation", ckpt("tws_dedup_ckpt")).start()
      try {
        input.addData(Keyed("a", "a1"), Keyed("b", "b1"), Keyed("a", "a2")); q.processAllAvailable()
        input.addData(Keyed("a", "a3"), Keyed("c", "c1")); q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_dedup").as[Keyed].collect().map(k => k.key -> k.payload).toMap
      require(rows == Map("a" -> "a1", "b" -> "b1", "c" -> "c1"), s"dedup: $rows")
      println("TWS-OK dedup=first-seen")
    }

    // scenario 3: checkpoint restart resumes the seen-registry (file
    // sink — the memory sink refuses checkpoint recovery by design)
    {
      val c   = ckpt("tws_restart_ckpt")
      val out = ckpt("tws_restart_out")
      val input = MemoryStream[Keyed]
      def start() = TwsDedup.firstSeenOnly(spark, input.toDS())
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", c).start()
      val q1 = start()
      input.addData(Keyed("a", "a1"), Keyed("b", "b1")); q1.processAllAvailable(); q1.stop()
      input.addData(Keyed("a", "a2"), Keyed("c", "c1"))
      val q2 = start()
      q2.processAllAvailable(); q2.stop()
      val all = spark.read.parquet(out).as[Keyed].collect().map(_.payload).toSet
      // 'a' must STILL be a duplicate after the restart: a2 never lands
      require(all == Set("a1", "b1", "c1"), s"restart resume: $all")
      println("TWS-OK restart=resumes")
    }

    // scenario 3b (--timers, default ON): event-time timers — the
    // sessionization primitive (register at watermark+gap, emit on
    // expiry). TimeMode.EventTime drives different state-store traffic
    // than TimeMode.None; probing it separately maps exactly which API
    // surface this container supports.
    if (!args.contains("--no-timers")) {
      val input = MemoryStream[(java.sql.Timestamp, String)]
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      val q = input.toDS().toDF("ts", "user")
        .withWatermark("ts", "10 minutes")
        .as[(java.sql.Timestamp, String)]
        .groupByKey(_._2)
        .transformWithState(new graft.streaming.TwsSessionize.SessionProcessor(
          gapMs = 5 * 60 * 1000L), TimeMode.EventTime(), OutputMode.Append())
      val qq = q.writeStream.format("memory").queryName("tws_sess").outputMode("append")
        .option("checkpointLocation", ckpt("tws_sess_ckpt")).start()
      try {
        input.addData((t(0), "u1"), (t(2), "u1"), (t(1), "u2")); qq.processAllAvailable()
        // advance the watermark far past u1/u2's gap: sessions close
        input.addData((t(40), "u3")); qq.processAllAvailable()
        input.addData((t(59), "zz")); qq.processAllAvailable()
      } finally qq.stop()
      val sess = spark.table("tws_sess")
        .as[graft.streaming.TwsSessionize.Session].collect()
        .map(s => s.user -> s.events).toMap
      require(sess.get("u1").contains(2L) && sess.get("u2").contains(1L),
        s"sessions: ${sess.toSeq.sorted}")
      println("TWS-OK timers=sessions-close")
    }

    // scenario 4 (OPT-IN --ttl): TTL'd registry re-admits after the
    // horizon. TTL requires TimeMode.ProcessingTime; as of the round-10
    // re-chase this no longer hangs on the chmod pipe but dies in a
    // Spark-internal planning NPE (PythonSQLMetrics init reads a null
    // plan session while the micro-batch thread plans the TTL cleanup
    // batch — TransformWithStateExecBase mixes in PythonSQLMetrics;
    // SURVEY §9). Run on a healthy host / newer Spark.
    if (args.contains("--ttl")) {
      val input = MemoryStream[Keyed]
      val q = TwsDedup.firstSeenOnly(spark, input.toDS(),
          TTLConfig(java.time.Duration.ofMillis(1)))
        .writeStream.format("memory").queryName("tws_ttl").outputMode("append")
        .option("checkpointLocation", ckpt("tws_ttl_ckpt")).start()
      try {
        input.addData(Keyed("a", "a1")); q.processAllAvailable()
        Thread.sleep(50)
        input.addData(Keyed("a", "a2")); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_ttl").as[Keyed].collect().map(_.payload).toSet
      require(got == Set("a1", "a2"), s"ttl re-admit: $got")
      println("TWS-OK ttl=re-admits")
    }

    spark.stop()
    println("TWS-OK all")
  }
}
