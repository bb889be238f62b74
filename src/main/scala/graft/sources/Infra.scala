package graft.sources

import java.time.Instant
import scala.concurrent.duration._
import scala.util.Random

/** Driver-side acquisition infrastructure mirroring the reference's
  * `_internal/{retry,cache}.py`: exponential backoff with jitter for
  * transient failures, and a TTL memo cache for feed snapshots. Fetchers
  * are injected (zero-egress here; network use is the caller's decision).
  */
object Infra {

  /** Which failures are worth retrying (transient network / throttling /
    * server errors — reference retry.py:50-64). The predicate receives the
    * exception; HTTP status mapping is the caller's (429 and >=500 retry).
    */
  def isTransient(e: Throwable): Boolean = e match {
    case _: java.net.SocketTimeoutException | _: java.net.ConnectException |
         _: java.io.InterruptedIOException | _: java.net.UnknownHostException => true
    case he: HttpStatusException => he.status == 429 || he.status >= 500
    case _ => false
  }

  final case class HttpStatusException(status: Int, msg: String)
    extends RuntimeException(s"HTTP $status: $msg")

  /** Exponential backoff with jitter (reference retry.py:66-98):
    * wait_n ~ Uniform(min, min(max, mult * 2^(n-1))).
    */
  def backoffWait(attempt: Int, minWait: Double = 0.5, maxWait: Double = 30.0,
                  multiplier: Double = 1.0,
                  rng: Random = new Random()): FiniteDuration = {
    val upper = math.min(maxWait,
      math.max(minWait, multiplier * math.pow(2, attempt - 1)))
    (minWait + rng.nextDouble() * (upper - minWait)).seconds
  }

  /** Run `f` with up to `maxAttempts` tries; only transient failures retry. */
  def retry[T](maxAttempts: Int = 5,
               shouldRetry: Throwable => Boolean = isTransient,
               sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis))
              (f: => T): T = {
    var attempt = 1
    while (true) {
      try return f
      catch {
        case e: Throwable if attempt < maxAttempts && shouldRetry(e) =>
          sleep(backoffWait(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** TTL memo cache (reference cache.py:12-40): 60 s default, short TTLs
    * for intraday endpoints, day-long for heavyweight reports.
    */
  final class TtlCache[K, V](ttl: FiniteDuration,
                             clock: () => Instant = () => Instant.now()) {
    private val store =
      scala.collection.concurrent.TrieMap.empty[K, (Instant, V)]

    def getOrElseUpdate(key: K)(compute: => V): V = {
      val now = clock()
      store.get(key) match {
        case Some((at, v))
          if java.time.Duration.between(at, now).toMillis < ttl.toMillis => v
        case _ =>
          val v = compute
          store.put(key, (now, v))
          v
      }
    }

    def invalidate(): Unit = store.clear()
  }
}
