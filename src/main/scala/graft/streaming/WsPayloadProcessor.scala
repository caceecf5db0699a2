package graft.streaming

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.streaming.LiveCollector.LiquidationEvent

/** WS payload processor — the reference's `BinanceWsPayloadProcessor`
  * (`sources/websocket.py:1874-2028`): parses raw combined-stream /
  * per-stream JSON payloads into the typed events the live collector
  * ingests, with the same coercion and validity gates (side whitelist,
  * executed-else-original quantity, event-time fallbacks, symbol from
  * stream prefix). Driver-side parsing; the events enter Spark as
  * Datasets or feed the stateful order book / minute accumulators.
  */
object WsPayloadProcessor {

  /** Ingestion surface the processor feeds (reference
    * `InMemoryLiveCollector`'s ingest methods). */
  trait Collector {
    def ingestDepthDiff(event: DepthDiffEvent, transactTime: Option[Long],
                        arrivalTime: Option[Long]): Unit
    def ingestLiquidation(event: LiquidationEvent): Unit
    def ingestTrade(symbol: String, eventTime: Option[Long],
                    transactTime: Option[Long], arrivalTime: Option[Long]): Unit
    def ingestPredictedFunding(eventTime: Long, predictedFunding: Option[Double],
                               nextFundingTime: Option[Long],
                               arrivalTime: Option[Long]): Unit
  }

  private def coerceLong(v: JValue): Option[Long] = v match {
    case JInt(i)    => Some(i.toLong)
    case JLong(l)   => Some(l)
    case JDouble(d) => Some(d.toLong)
    case JString(s) => s.toLongOption.orElse(s.toDoubleOption.map(_.toLong))
    case _          => None
  }

  private def coerceDouble(v: JValue): Option[Double] = v match {
    case JDouble(d)  => Some(d)
    case JInt(i)     => Some(i.toDouble)
    case JLong(l)    => Some(l.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case JString(s)  => s.toDoubleOption
    case _           => None
  }

  private def str(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s)
    case _                        => None
  }

  private def depthLevels(v: JValue): Seq[(Double, Double)] = v match {
    case JArray(rows) => rows.flatMap {
      case JArray(p :: q :: _) =>
        for (pp <- coerceDouble(p); qq <- coerceDouble(q)) yield (pp, qq)
      case _ => None
    }
    case _ => Nil
  }

  final class Processor(collector: Collector, symbol: String) {

    private val defaultSymbol = symbol.toUpperCase

    /** Combined-stream envelope: `{"stream": "...", "data": {...}}`
      * (reference `process_combined_payload`). */
    def processCombinedPayload(json: String, arrivalTimeMs: Option[Long] = None): Unit = {
      val j = JsonMethods.parse(json)
      (str(j \ "stream"), j \ "data") match {
        case (Some(stream), data: JObject) =>
          processStreamPayload(stream, data, arrivalTimeMs)
        case _ =>
      }
    }

    def processStreamPayload(streamName: String, json: String): Unit =
      processStreamPayload(streamName, json, None)

    def processStreamPayload(streamName: String, json: String,
                             arrivalTimeMs: Option[Long]): Unit =
      JsonMethods.parse(json) match {
        case o: JObject => processStreamPayload(streamName, o, arrivalTimeMs)
        case _          =>
      }

    def processStreamPayload(streamName: String, payload: JObject,
                             arrivalTimeMs: Option[Long]): Unit = {
      val lower = streamName.toLowerCase
      if (lower.contains("@depth")) processDepth(streamName, payload, arrivalTimeMs)
      else if (lower.contains("@forceorder")) processLiquidation(streamName, payload, arrivalTimeMs)
      else if (lower.contains("@aggtrade")) processAggTrade(streamName, payload, arrivalTimeMs)
      else if (lower.contains("@markprice")) processMarkPrice(payload, arrivalTimeMs)
    }

    private def symbolFromStream(streamName: String): String = {
      val prefix = streamName.split("@", 2)(0)
      if (prefix.nonEmpty) prefix.toUpperCase else defaultSymbol
    }

    /** `_process_depth_payload` (`websocket.py:1908-1938`): E/U/u are
      * required; levels arrive as ["price","qty"] string pairs. */
    private def processDepth(streamName: String, p: JObject,
                             arrival: Option[Long]): Unit = {
      val eventTime = coerceLong(p \ "E")
      val firstUpdateId = coerceLong(p \ "U")
      val finalUpdateId = coerceLong(p \ "u")
      if (eventTime.isEmpty || firstUpdateId.isEmpty || finalUpdateId.isEmpty) return
      collector.ingestDepthDiff(
        DepthDiffEvent(
          symbol = str(p \ "s").getOrElse(symbolFromStream(streamName)),
          eventTime = eventTime.get,
          firstUpdateId = firstUpdateId.get,
          finalUpdateId = finalUpdateId.get,
          bidDeltas = depthLevels(p \ "b"),
          askDeltas = depthLevels(p \ "a"),
          previousFinalUpdateId = coerceLong(p \ "pu")),
        transactTime = coerceLong(p \ "T"),
        arrivalTime = arrival)
    }

    /** `_process_liquidation_payload` (`websocket.py:1940-1986`): side
      * whitelist, avg-price preference, executed-else-original qty,
      * E-else-o.T event time. */
    private def processLiquidation(streamName: String, p: JObject,
                                   arrival: Option[Long]): Unit = {
      val o = (p \ "o") match {
        case obj: JObject => obj
        case _            => return
      }
      val side = str(o \ "S").map(_.toUpperCase).getOrElse("")
      if (side != "BUY" && side != "SELL") return
      val price = coerceDouble(o \ "ap").orElse(coerceDouble(o \ "p"))
      val origQty = coerceDouble(o \ "q")
      val executedQty = coerceDouble(o \ "z").orElse(coerceDouble(o \ "l"))
      val quantity = executedQty.filter(_ > 0).orElse(origQty)
      if (price.isEmpty || quantity.isEmpty || quantity.get <= 0) return
      val eventTime = coerceLong(p \ "E").orElse(coerceLong(o \ "T"))
      if (eventTime.isEmpty) return
      collector.ingestLiquidation(LiquidationEvent(
        symbol = str(o \ "s").orElse(str(p \ "s"))
          .getOrElse(symbolFromStream(streamName)),
        eventTime = eventTime.get,
        side = side,
        price = price.get,
        quantity = quantity.get,
        arrivalTime = arrival,
        origQuantity = origQty,
        executedQuantity = executedQty))
    }

    /** `_process_agg_trade_payload` (`websocket.py:1988-2007`): latency
      * bookkeeping only — E falls back to T. */
    private def processAggTrade(streamName: String, p: JObject,
                                arrival: Option[Long]): Unit = {
      val transactTime = coerceLong(p \ "T")
      val eventTime = coerceLong(p \ "E").orElse(transactTime)
      collector.ingestTrade(
        str(p \ "s").getOrElse(symbolFromStream(streamName)),
        eventTime, transactTime, arrival)
    }

    /** `_process_mark_price_payload` (`websocket.py:2009-2022`). */
    private def processMarkPrice(p: JObject, arrival: Option[Long]): Unit =
      coerceLong(p \ "E").foreach { eventTime =>
        collector.ingestPredictedFunding(eventTime,
          predictedFunding = coerceDouble(p \ "r"),
          nextFundingTime = coerceLong(p \ "T"),
          arrivalTime = arrival)
      }
  }
}
