package graft.sources

/** REST-fetch machinery (S8–S10 — reference `sources/rest.py:27-148`,
  * `binance_provider.py:477-651`, `parallel_provider.py:37-466`).
  * Driver-side plain Scala — source connectors are not Spark work
  * (SURVEY §2.1 S8): fetched record batches become Datasets via
  * `Seq[CaseClass].toDS()` and enter the data plane there.
  *
  * The transport is abstract so everything is testable offline (this
  * environment has zero egress); the retry / rate-limit / pagination /
  * weight-budget logic is the ported behavior.
  */
object RestClient {

  /** Transport abstraction: returns the response body, or throws
    * [[HttpError]] with a status + optional Retry-After seconds.
    * Override [[Transport.getResponse]] when the transport can surface
    * status + headers (weight accounting reads `x-mbx-used-weight*`). */
  trait Transport {
    def get(path: String, params: Map[String, String]): String
    def getResponse(path: String, params: Map[String, String]): HttpResponse =
      HttpResponse(get(path, params))
  }

  final case class HttpResponse(body: String, status: Int = 200,
                                headers: Map[String, String] = Map.empty)

  final case class HttpError(status: Int, retryAfterSeconds: Option[Long] = None)
    extends RuntimeException(s"HTTP $status")

  /** Request-weight tiers for kline fetches (reference
    * `core/binance_usage.py:21-30`). */
  def klineRequestWeight(limit: Int): Int =
    if (limit <= 99) 1 else if (limit <= 499) 2 else if (limit <= 1000) 5 else 10

  /** Weight budget tracker: 2400 weight/min hard limit (reference
    * `binance_usage.py:18`). */
  final class WeightBudget(maxPerMinute: Int = 2400,
                           now: () => Long = () => System.currentTimeMillis()) {
    private var windowStart = now()
    private var used = 0
    def tryAcquire(weight: Int): Boolean = synchronized {
      val t = now()
      if (t - windowStart >= 60000L) { windowStart = t; used = 0 }
      if (used + weight > maxPerMinute) false
      else { used += weight; true }
    }
    def usedThisMinute: Int = synchronized(used)
  }

  /** Rate-limited, retrying client: ≥`minIntervalMs` between requests,
    * ≤`maxRetries` attempts with exponential backoff capped at
    * `maxBackoffMs` + jitter, Retry-After honored, 429/5xx retried
    * (reference `rest.py:32-35,118-148`). `sleep`/`jitter` injectable
    * for deterministic tests (no wall-clock in logic, SURVEY §7.3). */
  final class RetryingClient(transport: Transport,
                             minIntervalMs: Long = 100,
                             maxRetries: Int = 5,
                             baseBackoffMs: Long = 500,
                             maxBackoffMs: Long = 60000,
                             sleep: Long => Unit = Thread.sleep,
                             jitterMs: () => Long = () => (math.random() * 300).toLong,
                             now: () => Long = () => System.currentTimeMillis()) {
    private var lastRequestAt = 0L
    var attempts = 0 // observability for tests

    def get(path: String, params: Map[String, String]): String = {
      val wait = minIntervalMs - (now() - lastRequestAt)
      if (wait > 0) sleep(wait)
      var attempt = 0
      var backoff = baseBackoffMs
      while (true) {
        attempt += 1
        attempts += 1
        lastRequestAt = now()
        try {
          val resp = transport.getResponse(path, params)
          graft.service.UsageTracker.recordRestResponse(
            path, resp.status, resp.headers, params)
          return resp.body
        } catch {
          case e: HttpError if attempt <= maxRetries &&
            (e.status == 429 || e.status >= 500) =>
            graft.service.UsageTracker.recordRestResponse(path, e.status,
              e.retryAfterSeconds.map(s => "retry-after" -> s.toString).toMap, params)
            graft.service.UsageTracker.recordRetry()
            val delay = e.retryAfterSeconds.map(_ * 1000L)
              .getOrElse(math.min(backoff, maxBackoffMs)) + jitterMs()
            sleep(delay)
            backoff = math.min(backoff * 2, maxBackoffMs)
          case e: HttpError =>
            // terminal: non-retryable status (418 ban, 403, 4xx) or
            // retries exhausted — record it so ban/throttle counters see
            // exactly the failures that matter, then propagate
            graft.service.UsageTracker.recordRestResponse(path, e.status,
              e.retryAfterSeconds.map(s => "retry-after" -> s.toString).toMap, params)
            throw e
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Cursor-advance pagination (S9 — reference
    * `binance_provider.py:477-651`): fetch pages until the window is
    * covered or a short page signals the end; the cursor advances past
    * the last row's timestamp. Page caps: 1500 klines / 1000 trades /
    * 500 ratio rows. */
  def paginate[R](startMs: Long, endMs: Long, pageSize: Int,
                  fetch: (Long, Int) => Seq[R], tsOf: R => Long): Seq[R] = {
    val out = Vector.newBuilder[R]
    var cursor = startMs
    var done = false
    while (!done && cursor <= endMs) {
      val page = fetch(cursor, pageSize)
      val kept = page.filter(r => tsOf(r) >= startMs && tsOf(r) <= endMs)
      out ++= kept
      if (page.isEmpty || page.size < pageSize) done = true
      else {
        val last = tsOf(page.last)
        if (last < cursor) done = true // defensive: no progress
        else cursor = last + 1
      }
    }
    out.result()
  }

  /** Ratio-row dedup by data_time keep-last (S9/A13 — reference
    * `binance_provider.py:643-651`). */
  def dedupByTimeKeepLast[R](rows: Seq[R], tsOf: R => Long): Seq[R] =
    rows.zipWithIndex
      .groupBy { case (r, _) => tsOf(r) }
      .map { case (_, grp) => grp.maxBy(_._2) }
      .toSeq.sortBy { case (r, _) => tsOf(r) }
      .map(_._1)

  /** Parallel endpoint fan-out (S10 — reference
    * `parallel_provider.py:37-59,380-466`): independent endpoint groups
    * fetched concurrently, each with its own client (and thus its own
    * rate limiter). */
  def fanOut[R](groups: Seq[() => R]): Seq[R] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(groups.map(g => Future(g()))), Duration(300, "seconds"))
  }
}
