package graft.streaming

/** Retry decision modes, the spec's `queryRetryMode`
  * (/root/reference/stream-spec-yaml-example.yaml:38-39).
  */
sealed trait RetryMode
object RetryMode {
  /** Never retry regardless of attempts budget — `never: {}`. */
  case object Never extends RetryMode
  /** Retry any failure up to maxAttempts. */
  case object Always extends RetryMode
  /** Retry only failures whose message matches the content list. */
  case object OnMessageContents extends RetryMode

  def fromName(name: String): RetryMode = name.trim.toLowerCase match {
    case "never"                                   => Never
    case "always"                                  => Always
    case "onmessagecontents" | "on_message_contents" => OnMessageContents
    case other => throw new IllegalArgumentException(s"unknown retry mode: $other")
  }
}

/** Bounded exponential retry with backoff — the reference's two retry
  * surfaces re-expressed as one policy: the source S3 retry
  * (`retryMaxAttempts`/`retryBaseDelay`/`retryMaxDelay`,
  * /root/reference/stream-spec-yaml-example.yaml:96-99) and the merge
  * client's query retry (`queryRetryMaxAttempts`/`queryRetryBaseDuration`/
  * `queryRetryScaleFactor`/`queryRetryMode`/`queryRetryOnMessageContents`,
  * yaml:37-43).
  *
  * Driver-side only: retries wrap listing and commit METADATA operations,
  * never per-row executor work (Spark's own task retry covers that).
  */
final case class RetryPolicy(
    maxAttempts: Int = 1,
    baseDelayMs: Long = 100,
    maxDelayMs: Long = 1000,
    /** delay growth per attempt: delay(n) = base · scaleFactor^(n-1),
      * capped at maxDelayMs — `queryRetryScaleFactor`. */
    scaleFactor: Double = 2.0,
    /** retry only when the failure message contains one of these —
      * `queryRetryOnMessageContents`. */
    retryOnMessageContents: Seq[String] = Seq.empty,
    /** explicit decision mode; None = inferred (non-empty content list →
      * OnMessageContents, else Always), preserving the pre-mode API. */
    mode: Option[RetryMode] = None
) {
  require(maxAttempts >= 1)

  def effectiveMode: RetryMode =
    mode.getOrElse(if (retryOnMessageContents.isEmpty) RetryMode.Always else RetryMode.OnMessageContents)

  def delayForAttempt(attempt: Int): Long =
    math.min(maxDelayMs, (baseDelayMs * math.pow(scaleFactor, attempt.toDouble - 1)).toLong)

  def isRetryable(e: Throwable): Boolean = effectiveMode match {
    case RetryMode.Never  => false
    case RetryMode.Always => true
    case RetryMode.OnMessageContents =>
      retryOnMessageContents.exists(s => Option(e.getMessage).exists(_.contains(s)))
  }
}

object RetryPolicy {
  /** No retries (a single attempt) — the reference's `never` mode. */
  val Never: RetryPolicy = RetryPolicy(maxAttempts = 1, mode = Some(RetryMode.Never))
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
