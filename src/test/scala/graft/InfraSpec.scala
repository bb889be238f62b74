package graft

import java.time.Instant
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Infra

class InfraSpec extends AnyFunSuite {

  test("retry: transient failures retry with backoff, fatal ones do not") {
    var calls = 0
    val got = Infra.retry[Int](maxAttempts = 5, sleep = _ => ()) {
      calls += 1
      if (calls < 3) throw new java.net.ConnectException("down")
      42
    }
    assert(got == 42 && calls == 3)

    calls = 0
    intercept[IllegalArgumentException] {
      Infra.retry[Int](maxAttempts = 5, sleep = _ => ()) {
        calls += 1
        throw new IllegalArgumentException("bad input")
      }
    }
    assert(calls == 1) // not transient -> no retry

    calls = 0
    intercept[Infra.HttpStatusException] {
      Infra.retry[Int](maxAttempts = 3, sleep = _ => ()) {
        calls += 1
        throw Infra.HttpStatusException(503, "unavailable")
      }
    }
    assert(calls == 3) // transient -> exhausts attempts

    // 404 is not transient
    assert(!Infra.isTransient(Infra.HttpStatusException(404, "nope")))
    assert(Infra.isTransient(Infra.HttpStatusException(429, "slow down")))
  }

  test("backoff grows exponentially within [min, max]") {
    val rng = new scala.util.Random(7)
    val waits = (1 to 8).map(a => Infra.backoffWait(a, rng = rng).toMillis)
    assert(waits.forall(w => w >= 500 && w <= 30000))
  }

  test("TTL cache: hit within ttl, recompute after expiry") {
    var now = Instant.parse("2026-01-01T00:00:00Z")
    val cache = new Infra.TtlCache[String, Int](60.seconds, () => now)
    var computes = 0
    def get() = cache.getOrElseUpdate("k") { computes += 1; computes }
    assert(get() == 1 && get() == 1 && computes == 1)
    now = now.plusSeconds(61)
    assert(get() == 2 && computes == 2)
  }
}
