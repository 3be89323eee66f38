package graft.operators

/** Retry/backoff policy around merge-style writes.
  *
  * Re-expresses the reference's conflict handling
  * (reference: lambda/handler.py:617-657; FIX_TRANSACTION_CONFLICTS.md:20-57;
  * ERROR_HANDLING_BEST_PRACTICES.md:10-65):
  * - up to `maxRetries` attempts on *retryable* errors;
  * - exponential backoff `base^attempt` seconds capped at `capSeconds`,
  *   plus uniform jitter (the reference's tuned policy is 3^n capped
  *   ~243 s + 0-2 s jitter);
  * - non-retryable errors fail fast (the 4xx class);
  * - retryable classification by message content (mvcc/concurrent/
  *   conflict) mirroring handler.py:646-648.
  *
  * Under Spark's single-writer-per-table scheduling most of this is
  * dormant (SURVEY §4) — it exists for parity and for transient storage
  * errors.
  */
object Retry {

  final case class Policy(
      maxRetries: Int = 10,
      base: Double = 3.0,
      capSeconds: Double = 243.0,
      jitterSeconds: Double = 2.0,
      isRetryable: Throwable => Boolean = defaultRetryable,
      sleeper: Long => Unit = Thread.sleep)

  /** Message-content classification (reference: handler.py:646-648). */
  def defaultRetryable(e: Throwable): Boolean = {
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    Seq("mvcc", "concurrent", "conflict", "timeout", "connection reset")
      .exists(msg.contains)
  }

  /** Deterministic backoff schedule (pre-jitter) for attempt n (0-based). */
  def backoffSeconds(policy: Policy, attempt: Int): Double =
    math.min(math.pow(policy.base, attempt), policy.capSeconds)

  final case class RetriesExhausted(attempts: Int, last: Throwable)
    extends RuntimeException(
      s"operation failed after $attempts attempts: ${last.getMessage}", last)

  /** Run `op` under the policy. The jitter source is injectable for
    * deterministic tests.
    */
  def withRetry[T](policy: Policy = Policy(), jitter: () => Double = () => math.random())(
      op: => T): T = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: Throwable if policy.isRetryable(e) && attempt < policy.maxRetries - 1 =>
          val wait = backoffSeconds(policy, attempt) + jitter() * policy.jitterSeconds
          policy.sleeper((wait * 1000).toLong)
          attempt += 1
        case e: Throwable if policy.isRetryable(e) =>
          throw RetriesExhausted(attempt + 1, e)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
