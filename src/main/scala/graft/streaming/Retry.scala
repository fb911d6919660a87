package graft.streaming

/** Bounded exponential retry with backoff — the reference's two retry
  * surfaces re-expressed as one policy: the source S3 retry
  * (`retryMaxAttempts`/`retryBaseDelay`/`retryMaxDelay`,
  * /root/reference/stream-spec-yaml-example.yaml:96-99) and the merge
  * client's query retry (`queryRetryMaxAttempts`/`queryRetryBaseDuration`/
  * `queryRetryOnMessageContents`, yaml:37-43).
  *
  * Driver-side only: retries wrap listing and commit METADATA operations,
  * never per-row executor work (Spark's own task retry covers that).
  */
final case class RetryPolicy(
    maxAttempts: Int = 1,
    baseDelayMs: Long = 100,
    maxDelayMs: Long = 1000,
    scaleFactor: Double = 2.0,
    /** retry only when the failure message contains one of these (empty =
      * retry any exception) — `queryRetryOnMessageContents`.
      */
    retryOnMessageContents: Seq[String] = Seq.empty
) {
  require(maxAttempts >= 1)

  def delayForAttempt(attempt: Int): Long =
    math.min(maxDelayMs, (baseDelayMs * math.pow(scaleFactor, attempt.toDouble - 1)).toLong)

  def isRetryable(e: Throwable): Boolean =
    retryOnMessageContents.isEmpty ||
      retryOnMessageContents.exists(s => Option(e.getMessage).exists(_.contains(s)))
}

object RetryPolicy {
  /** No retries (a single attempt) — the reference's `never` mode. */
  val Never: RetryPolicy = RetryPolicy(maxAttempts = 1)
}

object Retry {

  /** Run `body`, retrying transient failures per `policy`. `sleep` is
    * injectable so specs can assert backoff without wall-clock waits.
    */
  def withRetry[A](
      policy: RetryPolicy,
      sleep: Long => Unit = Thread.sleep,
      onRetry: (Int, Throwable) => Unit = (_, _) => ()
  )(body: => A): A = {
    var attempt = 1
    var result: Option[A] = None
    while (result.isEmpty) {
      try result = Some(body)
      catch {
        case e: Throwable if attempt < policy.maxAttempts && policy.isRetryable(e) =>
          onRetry(attempt, e)
          sleep(policy.delayForAttempt(attempt))
          attempt += 1
      }
    }
    result.get
  }
}
