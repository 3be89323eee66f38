package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retry

/** Retry/backoff policy (reference: handler.py:617-657;
  * FIX_TRANSACTION_CONFLICTS.md:27-57).
  */
class RetrySpec extends AnyFunSuite {

  def policy(maxRetries: Int = 10): Retry.Policy =
    Retry.Policy(maxRetries = maxRetries, sleeper = _ => ())

  test("retryable error retried until success") {
    var calls = 0
    val out = Retry.withRetry(policy(), jitter = () => 0.0) {
      calls += 1
      if (calls < 4) throw new RuntimeException("MVCC conflict detected")
      "ok"
    }
    assert(out == "ok" && calls == 4)
  }

  test("non-retryable error fails fast") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetry(policy(), jitter = () => 0.0) {
        calls += 1
        throw new RuntimeException("syntax error")
      }
    }
    assert(e.getMessage == "syntax error" && calls == 1)
  }

  test("retries exhausted after maxRetries attempts") {
    var calls = 0
    val e = intercept[Retry.RetriesExhausted] {
      Retry.withRetry(policy(maxRetries = 3), jitter = () => 0.0) {
        calls += 1
        throw new RuntimeException("concurrent write conflict")
      }
    }
    assert(calls == 3 && e.attempts == 3)
  }

  test("backoff schedule: 3^n capped at 243s (reference policy)") {
    val p = policy()
    assert(Retry.backoffSeconds(p, 0) == 1.0)
    assert(Retry.backoffSeconds(p, 1) == 3.0)
    assert(Retry.backoffSeconds(p, 4) == 81.0)
    assert(Retry.backoffSeconds(p, 5) == 243.0)
    assert(Retry.backoffSeconds(p, 9) == 243.0) // capped
  }

  test("retryable classification mirrors the reference's message matching") {
    assert(Retry.defaultRetryable(new RuntimeException("MVCC violation")))
    assert(Retry.defaultRetryable(new RuntimeException("Concurrent update conflict")))
    assert(Retry.defaultRetryable(new RuntimeException("read timeout")))
    assert(!Retry.defaultRetryable(new RuntimeException("column not found")))
    assert(!Retry.defaultRetryable(new RuntimeException(null: String)))
  }
}
