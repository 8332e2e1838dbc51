package graft.pipeline

/** Remote-catalog write protection, matching the reference's Glue
  * throttling discipline (`/root/reference/etl/extract.py:135-159`): work
  * is issued in batches, each batch retried on throttling-class errors
  * with exponential backoff `min(2^attempt, 32) seconds`, at most
  * `maxAttempts` retries, and any non-retryable error raised immediately.
  *
  * Spark's local metastore needs none of this — but a user pointing
  * [[Catalog.syncPartitions]] at a remote Glue/HMS catalog hits request
  * throttling exactly as the reference did, and a partition-registration
  * job that dies 80% through on a rate limit re-lists and re-diffs the
  * world on rerun. The utility is deliberately tiny and injectable
  * (`sleep`, `isRetryable`) so specs can drive it without wall-clock.
  */
object Retry {

  /** The reference retries exactly the throttling error class
    * (`ThrottlingException` / `TooManyRequestsException`); message
    * matching is the provider-neutral rendering of that list. Anything
    * else — permission, validation, logic — fails fast.
    */
  def defaultRetryable(t: Throwable): Boolean = {
    val m = Option(t.getMessage).getOrElse("")
    m.contains("Throttling") || m.contains("TooManyRequests") ||
      m.contains("Rate exceeded")
  }

  /** Run `op`, retrying up to `maxAttempts` times on retryable failures
    * with backoff 2s, 4s, 8s, … capped at `capMs`. Returns the first
    * success; rethrows the last failure once attempts are exhausted or
    * immediately when `isRetryable` rejects it.
    */
  def withRetry[T](maxAttempts: Int = 5, capMs: Long = 32000L,
                   isRetryable: Throwable => Boolean = defaultRetryable,
                   sleep: Long => Unit = Thread.sleep)(op: => T): T = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        // NonFatal first: a fatal error (OutOfMemoryError, Interrupted-
        // Exception, …) must propagate even if its message happens to
        // contain a throttling substring or the caller's isRetryable is
        // permissive — retrying an interrupt would swallow it.
        case scala.util.control.NonFatal(e) if isRetryable(e) && attempt < maxAttempts =>
          attempt += 1
          sleep(math.min(1000L << attempt, capMs)) // 2^attempt seconds
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
