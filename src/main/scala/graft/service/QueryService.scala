package graft.service

import java.time.Instant
import java.time.temporal.ChronoUnit
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.concurrent.{Future, Promise}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MinuteBuilder, QueryAggregator}
import graft.schema.Timeframes
import graft.sources.MinuteLakeReader

/** Keyed result cache with TTL + LRU + hit taxonomy (reference
  * `live_data_api_service/service.py:192-550`): exact hits, superset
  * hits (a cached window covering the request is sliced), and in-flight
  * dedup (concurrent identical requests share one computation).
  * TTL splits stable (window fully in the past) vs recent.
  * Plain Scala service-layer code — `df.cache()` is not a substitute for
  * keyed result caching (SURVEY §4). */
final class ResultCache[K, V](maxEntries: Int = 256,
                              stableTtlSeconds: Long = 21600,
                              recentTtlSeconds: Long = 15,
                              now: () => Instant = () => Instant.now) {

  final case class Entry(value: V, storedAt: Instant, stable: Boolean)
  sealed trait HitType
  case object Miss extends HitType
  case object ExactHit extends HitType
  case object SupersetHit extends HitType
  case object InFlightHit extends HitType

  private val entries = mutable.LinkedHashMap[K, Entry]()
  private val inflight = new ConcurrentHashMap[K, Promise[V]]()
  private var lastHit: HitType = Miss
  def lastHitType: HitType = lastHit

  private def fresh(e: Entry): Boolean = {
    val ttl = if (e.stable) stableTtlSeconds else recentTtlSeconds
    ChronoUnit.SECONDS.between(e.storedAt, now()) <= ttl
  }

  /** Get-or-compute with exact/superset/in-flight semantics.
    * @param supersetOf key k2 "covers" key k1 (e.g. wider window)
    * @param slice      derive the requested value from a superset value */
  def getOrCompute(key: K, stable: Boolean,
                   supersetOf: (K, K) => Boolean = (_: K, _: K) => false,
                   slice: (K, V) => V = (_: K, v: V) => v)(compute: => V): V = {
    synchronized {
      entries.get(key).filter(fresh) match {
        case Some(e) =>
          lastHit = ExactHit
          entries.remove(key); entries.put(key, e) // LRU touch
          return e.value
        case None =>
      }
      entries.find { case (k2, e) => supersetOf(k2, key) && fresh(e) } match {
        case Some((_, e)) =>
          lastHit = SupersetHit
          return slice(key, e.value)
        case None =>
      }
    }
    // in-flight dedup outside the lock: first caller computes, the rest
    // await its promise
    val p = Promise[V]()
    val existing = inflight.putIfAbsent(key, p)
    if (existing != null) {
      lastHit = InFlightHit
      return scala.concurrent.Await.result(existing.future,
        scala.concurrent.duration.Duration(300, "seconds"))
    }
    try {
      val v = compute
      synchronized {
        entries.put(key, Entry(v, now(), stable))
        while (entries.size > maxEntries) entries.remove(entries.head._1)
      }
      lastHit = Miss
      p.success(v)
      v
    } catch {
      case e: Throwable => p.failure(e); throw e
    } finally inflight.remove(key)
  }

  def size: Int = synchronized(entries.size)
}

/** API query service (reference `live_data_api_service/service.py`,
  * §3.1): canonical window load with coverage accounting → timeframe
  * aggregation → delta fields → serialization. */
object QueryService {

  final case class WindowCoverage(expectedMinutes: Long, observedMinutes: Long) {
    def complete: Boolean = expectedMinutes == observedMinutes
  }

  /** Load [start, end] canonical minutes with latest-wins dedup and
    * coverage check (reference `service.py:1036-1117`). */
  def loadCanonicalWindow(spark: SparkSession, reader: MinuteLakeReader,
                          symbol: String, start: Instant, end: Instant): (DataFrame, WindowCoverage) = {
    val df = reader.readWindow(spark, symbol, start, end)
    val observed = df.select(countDistinct(col("timestamp"))).collect().head.getLong(0)
    val expected = ChronoUnit.MINUTES.between(start, end) + 1
    (df, WindowCoverage(expected, observed))
  }

  /** One timeframe of the flagship query: aggregate the canonical
    * window, add lag deltas, serialize (reference `service.py:1553-1693`). */
  def candleBars(spark: SparkSession, reader: MinuteLakeReader, symbol: String,
                 timeframe: String, start: Instant, end: Instant,
                 limit: Int = 200): DataFrame = {
    val spec = Timeframes.parse(timeframe)
    val (window, _) = loadCanonicalWindow(spark, reader, symbol, start, end)
    val agg = QueryAggregator.aggregateCanonicalFrame(window, spec, limit)
    serializeFrame(QueryAggregator.addDeltaFields(agg))
  }

  /** Serialization (reference `utils.py:73-110`): timeframe-neutral
    * aliases (vwap_1m → vwap_bar, realized_vol_1m → realized_vol_bar),
    * `_`-prefixed internal-column scrub, ISO-8601 timestamps with
    * exactly 3 fraction digits. */
  def serializeFrame(frameIn: DataFrame,
                     includeDeprecatedFields: Boolean = false): DataFrame = {
    var frame = frameIn
    val cols = frame.columns.toSet
    if (!cols.contains("vwap_bar") && cols.contains("vwap_1m"))
      frame = frame.withColumn("vwap_bar", col("vwap_1m"))
    if (!cols.contains("realized_vol_bar") && cols.contains("realized_vol_1m"))
      frame = frame.withColumn("realized_vol_bar", col("realized_vol_1m"))
    if (!includeDeprecatedFields)
      frame = frame.drop("vwap_1m", "realized_vol_1m")
    frame = frame.drop(frame.columns.filter(_.startsWith("_")).toSeq: _*)
    frame.withColumn("timestamp",
      date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
  }
}
