package graft

import org.scalatest.funsuite.AnyFunSuite

/** Default-suite transformWithState coverage via an ISOLATED JVM.
  *
  * The RocksDB state store's local-FS op rate deadlocks this
  * container's JDK process-pipe under the heavily-threaded suite JVM
  * (Hadoop Shell forks for chmod/readlink hang — SURVEY §9), but the
  * same scenarios pass reliably in a light single-purpose JVM. So the
  * suite FORKS one: `graft.tools.TwsProbe` runs cross-batch dedup,
  * checkpoint-restart resume, and event-time-timer session close on
  * RocksDB, and this spec asserts its `TWS-OK all` contract — making
  * `sbt test` green-by-default on the full transformWithState surface
  * instead of env-gating it away. The in-process variants stay in
  * TwsDedupSpec behind GRAFT_TWS_SPEC for healthy hosts.
  *
  * A TIMEOUT (not a hang) is the failure mode if the deadlock ever
  * reaches the isolated JVM: the child is killed and the spec fails
  * with its captured output.
  */
class TwsForkedSpec extends AnyFunSuite {

  // mirrors build.sbt's jdk17AddOpens (Spark 4 outside spark-submit)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("transformWithState dedup/restart/timers pass on RocksDB in a forked JVM") {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    // Test / fork := true, so this JVM's classpath IS the full test
    // classpath (main classes + Spark jars) the probe needs
    val cp  = System.getProperty("java.class.path")
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.tools.TwsProbe")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val outBuf = new StringBuilder
    // drain continuously: a full pipe buffer would deadlock the child
    val drainer = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = r.readLine()
      while (line != null) {
        outBuf.synchronized { outBuf.append(line).append('\n') }
        line = r.readLine()
      }
    })
    drainer.setDaemon(true)
    drainer.start()
    val finished = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      proc.destroyForcibly()
      fail("TwsProbe timed out after 300s — the state-store deadlock reached " +
        s"the isolated JVM. Output so far:\n${outBuf.synchronized(outBuf.toString).takeRight(4000)}")
    }
    drainer.join(5000)
    val out = outBuf.synchronized(outBuf.toString)
    assert(proc.exitValue() == 0, s"TwsProbe exit ${proc.exitValue()}:\n${out.takeRight(4000)}")
    for (mark <- Seq("TWS-OK count=7", "TWS-OK dedup=first-seen",
        "TWS-OK restart=resumes", "TWS-OK timers=sessions-close", "TWS-OK all"))
      assert(out.contains(mark), s"missing '$mark' in probe output:\n${out.takeRight(4000)}")
  }
}
