package graft.service

import scala.collection.mutable

/** Per-request Binance usage accounting (reference
  * `core/binance_usage.py`): REST call / retry / throttle-status
  * counters, observed `x-mbx-used-weight*` header progression,
  * cache-event counts, and the estimated kline weight budget — the
  * metadata block the API attaches to every response
  * (`binance_usage.py:129-166`).
  *
  * The reference scopes one tracker per request via a contextvar
  * (`binance_usage.py:171-209`); here [[UsageTracker.scope]] does the
  * same with a ThreadLocal (per-timeframe fan-out threads each get the
  * tracker installed by their spawning request thread passed through
  * explicitly — see [[QueryService.perpetualPayload]]).
  */
object UsageTracker {

  val KlineEndpoints: Set[String] = Set(
    "/fapi/v1/klines", "/fapi/v1/markPriceKlines",
    "/fapi/v1/indexPriceKlines", "/fapi/v1/premiumIndexKlines")
  val RequestWeightLimit1m: Int = 2400

  /** Estimated weight for a kline request, None for non-kline endpoints
    * or absent/invalid limits (`binance_usage.py:33-48`). */
  def estimateKlineWeight(path: String, params: Map[String, String]): Option[Int] =
    if (!KlineEndpoints.contains(path)) None
    else params.get("limit").flatMap(_.toIntOption).filter(_ >= 1)
      .map(graft.sources.RestClient.klineRequestWeight)

  final class Tracker(val requestPath: String) {
    var restCallCount = 0
    var retryCount = 0
    var status429Count = 0
    var status418Count = 0
    var status403Count = 0
    var maxRetryAfterSeconds: Option[Double] = None
    val endpointCounts: mutable.Map[String, Int] = mutable.Map().withDefaultValue(0)
    val firstWeightHeaders: mutable.Map[String, Int] = mutable.Map()
    val lastWeightHeaders: mutable.Map[String, Int] = mutable.Map()
    val maxWeightHeaders: mutable.Map[String, Int] = mutable.Map()
    val cacheEventCounts: mutable.Map[String, Int] = mutable.Map().withDefaultValue(0)
    var estimatedKlineWeightTotal = 0
    val estimatedKlineEndpointWeights: mutable.Map[String, Int] = mutable.Map().withDefaultValue(0)
    val estimatedKlineRequests: mutable.Buffer[Map[String, String]] = mutable.Buffer()

    def recordRestResponse(path: String, statusCode: Int,
                           headers: Map[String, String] = Map.empty,
                           params: Map[String, String] = Map.empty): Unit = synchronized {
      // HTTP header names are case-insensitive; transports may surface
      // canonical casing (X-MBX-USED-WEIGHT-1M, Retry-After)
      val hdrs = headers.map { case (k, v) => k.toLowerCase -> v }
      restCallCount += 1
      endpointCounts(path) += 1
      estimateKlineWeight(path, params).foreach { w =>
        estimatedKlineWeightTotal += w
        estimatedKlineEndpointWeights(path) += w
        val summary = Map("path" -> path, "estimated_weight" -> w.toString) ++
          Seq("interval", "limit", "symbol", "pair")
            .flatMap(k => params.get(k).map(k -> _))
        estimatedKlineRequests += summary
      }
      statusCode match {
        case 429 => status429Count += 1
        case 418 => status418Count += 1
        case 403 => status403Count += 1
        case _ =>
      }
      hdrs.get("retry-after").flatMap(_.toDoubleOption).foreach { ra =>
        maxRetryAfterSeconds = Some(maxRetryAfterSeconds.fold(ra)(math.max(_, ra)))
      }
      for ((k, v) <- hdrs if k.startsWith("x-mbx-used-weight");
           parsed <- v.toIntOption) {
        firstWeightHeaders.getOrElseUpdate(k, parsed)
        lastWeightHeaders(k) = parsed
        maxWeightHeaders(k) = maxWeightHeaders.get(k).fold(parsed)(math.max(_, parsed))
      }
    }

    def recordRetry(): Unit = synchronized { retryCount += 1 }
    def recordCacheEvent(name: String): Unit = synchronized { cacheEventCounts(name) += 1 }

    /** The response-metadata log block (`binance_usage.py:129-166`). */
    def asLogFields: Map[String, Any] = synchronized {
      val progress = lastWeightHeaders.keys.toSeq.sorted.map { h =>
        h -> Map(
          "first" -> firstWeightHeaders.get(h),
          "last" -> lastWeightHeaders.get(h),
          "max" -> maxWeightHeaders.get(h),
          "delta_after_first" -> math.max(
            lastWeightHeaders.getOrElse(h, 0) - firstWeightHeaders.getOrElse(h, 0), 0))
      }.toMap
      Map(
        "request_path" -> requestPath,
        "binance_rest_call_count" -> restCallCount,
        "binance_retry_count" -> retryCount,
        "binance_429_count" -> status429Count,
        "binance_418_count" -> status418Count,
        "binance_403_count" -> status403Count,
        "binance_max_retry_after_seconds" -> maxRetryAfterSeconds,
        "binance_endpoint_counts" -> endpointCounts.toMap,
        "binance_observed_weight_headers" -> progress,
        "binance_cache_events" -> cacheEventCounts.toMap,
        "binance_estimated_kline_weight_total" -> estimatedKlineWeightTotal,
        "binance_futures_request_weight_limit_1m" -> RequestWeightLimit1m,
        "binance_estimated_kline_weight_remaining_1m" ->
          math.max(RequestWeightLimit1m - estimatedKlineWeightTotal, 0),
        "binance_estimated_kline_weight_pct_1m" ->
          math.rint(estimatedKlineWeightTotal.toDouble / RequestWeightLimit1m * 100 * 1e6) / 1e6,
        "binance_estimated_kline_weight_by_endpoint" -> estimatedKlineEndpointWeights.toMap,
        "binance_estimated_kline_requests" -> estimatedKlineRequests.toSeq)
    }
  }

  private val current = new ThreadLocal[Option[Tracker]] {
    override def initialValue(): Option[Tracker] = None
  }

  /** Install a tracker for the duration of `body` (reference
    * `binance_usage_scope`). */
  def scope[T](requestPath: String)(body: Tracker => T): T = {
    val tracker = new Tracker(requestPath)
    val prev = current.get()
    current.set(Some(tracker))
    try body(tracker)
    finally current.set(prev)
  }

  /** Install an EXISTING tracker on this thread (fan-out workers). */
  def withTracker[T](tracker: Tracker)(body: => T): T = {
    val prev = current.get()
    current.set(Some(tracker))
    try body
    finally current.set(prev)
  }

  def currentTracker: Option[Tracker] = current.get()

  def recordRestResponse(path: String, statusCode: Int,
                         headers: Map[String, String] = Map.empty,
                         params: Map[String, String] = Map.empty): Unit =
    currentTracker.foreach(_.recordRestResponse(path, statusCode, headers, params))
  def recordRetry(): Unit = currentTracker.foreach(_.recordRetry())
  def recordCacheEvent(name: String): Unit =
    currentTracker.foreach(_.recordCacheEvent(name))
}
