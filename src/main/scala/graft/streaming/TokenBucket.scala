package graft.streaming

/** Token-bucket rate limiter, the reference's `advisedRate` /
  * `advisedBurst` throughput settings
  * (/root/reference/stream-spec-yaml-example.yaml:78-79): admit up to
  * `ratePerSecond` items steadily with bursts up to `burst`.
  *
  * Deterministic: time is injected (nanos), so schedules are testable
  * and reproducible. In the pipeline this gates how many staged chunks a
  * cycle submits; the per-file analog on the source side is
  * `maxFilesPerTrigger`.
  */
final class TokenBucket(ratePerSecond: Double, burst: Long, nowNanos: () => Long) {
  require(ratePerSecond > 0 && burst > 0)
  private var tokens: Double  = burst.toDouble
  private var lastNanos: Long = nowNanos()

  private def refill(): Unit = {
    val now = nowNanos()
    tokens = math.min(burst.toDouble, tokens + (now - lastNanos) / 1e9 * ratePerSecond)
    lastNanos = now
  }

  /** Try to take `n` tokens; true if admitted. */
  def tryAcquire(n: Long = 1): Boolean = synchronized {
    refill()
    if (tokens >= n) { tokens -= n; true } else false
  }

  /** Nanos until `n` tokens will be available (0 if available now). */
  def nanosUntilAvailable(n: Long = 1): Long = synchronized {
    refill()
    if (tokens >= n) 0L else math.ceil((n - tokens) / ratePerSecond * 1e9).toLong
  }
}
