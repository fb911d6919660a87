package graft.streaming

import scala.util.Random

/** Change-capture cadence with deterministic jitter, the reference's
  * `changeCaptureInterval` / `changeCaptureJitterVariance` /
  * `changeCaptureJitterSeed`
  * (/root/reference/stream-spec-yaml-example.yaml:27-30). Jitter spreads
  * many concurrent streams' polling so a fleet does not hammer the
  * source in lockstep; the seed makes schedules reproducible.
  *
  * In continuous mode Spark's `Trigger.ProcessingTime` takes the base
  * interval; `nextDelayMs` supplies the jittered delay for
  * poll-style (AvailableNow-per-cycle) deployments like the reference's.
  */
final class ChangeCapture(intervalMs: Long, jitterVariance: Double, jitterSeed: Long) {
  require(jitterVariance >= 0 && jitterVariance < 1, "variance must be in [0, 1)")
  private val rnd = new Random(jitterSeed)

  /** Next delay: intervalMs * (1 ± variance), uniformly. */
  def nextDelayMs(): Long = {
    val factor = 1.0 + jitterVariance * (rnd.nextDouble() * 2 - 1)
    math.max(1L, math.round(intervalMs * factor))
  }

  /** The first n delays (for tests / schedule preview). */
  def schedule(n: Int): Seq[Long] = Seq.fill(n)(nextDelayMs())
}
