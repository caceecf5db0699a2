package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sources.RestClient.RetryingClient

/** Typed REST endpoint fetchers (S8 — reference `sources/rest.py:154-519`):
  * the 11 Binance USD-M futures endpoints the minute builder is fed from,
  * each parsing its JSON payload into a case-class record whose field
  * names line up with the column names [[graft.operators.MinuteBuilder]]
  * expects, so `records.toDS()` enters the data plane directly.
  *
  * Pure driver-side Scala over the abstract transport — fully
  * fixture-testable offline. Numeric fields arrive as JSON strings for
  * prices (Binance convention) and are coerced like the reference's
  * `float(...)`/`int(...)` casts.
  */
object RestEndpoints {

  // -------------------------------------------------------------- records

  /** Kline row (reference `rest.py:154-200`). */
  final case class KlineRecord(open_time: Long, open: Double, high: Double,
                               low: Double, close: Double, volume_btc: Double,
                               close_time: Long, volume_usdt: Double,
                               trade_count: Long, taker_buy_vol_btc: Double,
                               taker_buy_vol_usdt: Double)

  /** Mark-price kline row (reference `rest.py:202-229`). */
  final case class MarkPriceKline(open_time: Long, mark_price_open: Double,
                                  mark_price_high: Double, mark_price_low: Double,
                                  mark_price_close: Double)

  /** Index-price kline row (reference `rest.py:231-258`; note the `pair`
    * request param instead of `symbol`). */
  final case class IndexPriceKline(open_time: Long, index_price_open: Double,
                                   index_price_high: Double, index_price_low: Double,
                                   index_price_close: Double)

  /** Premium-index kline row (reference `rest.py:260-287`). */
  final case class PremiumIndexKline(open_time: Long, premium_index_open: Double,
                                     premium_index_high: Double,
                                     premium_index_low: Double,
                                     premium_index_close: Double)

  /** Aggregated trade (reference `rest.py:289-318`). */
  final case class AggTradeRecord(agg_trade_id: Long, price: Double, qty: Double,
                                  first_trade_id: Long, last_trade_id: Long,
                                  transact_time: Long, is_buyer_maker: Boolean)

  /** Book-ticker snapshot (reference `rest.py:320-333`). */
  final case class BookTickerSnapshot(bid_price: Double, bid_qty: Double,
                                      ask_price: Double, ask_qty: Double,
                                      event_time: Long)

  /** Premium-index snapshot (reference `rest.py:335-350`). */
  final case class PremiumSnapshot(mark_price: Double, index_price: Double,
                                   last_funding_rate: Double,
                                   next_funding_time: Long,
                                   predicted_funding: Double, event_time: Long)

  /** Open-interest point snapshot (reference `rest.py:352-363`). */
  final case class OpenInterestSnapshot(symbol: String, open_interest: Double,
                                        event_time: Long)

  /** L2 depth snapshot (reference `rest.py:365-381`). */
  final case class DepthSnapshot(symbol: String, last_update_id: Long,
                                 bids: Seq[(Double, Double)],
                                 asks: Seq[(Double, Double)],
                                 event_time: Long, transact_time: Long)

  /** Long/short ratio row — shared by the topLongShortAccountRatio,
    * globalLongShortAccountRatio and topLongShortPositionRatio endpoints
    * (reference `rest.py:383-455`). */
  final case class LsRatioRecord(symbol: String, data_time: Long, ratio: Double,
                                 long_account: Double, short_account: Double)

  /** Historical open-interest row (reference `rest.py:457-487`). */
  final case class OpenInterestHistRecord(symbol: String, oi_contracts: Double,
                                          oi_value_usdt: Double, create_time: Long)

  /** Funding-rate event row; mark_price may be absent/blank (reference
    * `rest.py:489-519`). */
  final case class FundingRateRecord(symbol: String, funding_rate: Double,
                                     funding_time: Long,
                                     mark_price: Option[Double])

  // -------------------------------------------------------------- parsing

  private def num(v: JValue): Double = v match {
    case JString(s)  => s.toDouble
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JInt(i)     => i.toDouble
    case JLong(l)    => l.toDouble
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  private def lng(v: JValue): Long = v match {
    case JInt(i)    => i.toLong
    case JLong(l)   => l
    case JString(s) => s.toLong
    case JDouble(d) => d.toLong
    case other => throw new IllegalArgumentException(s"not an integer: $other")
  }

  private def lngOr(v: JValue, default: Long): Long = v match {
    case JNothing | JNull => default
    case other            => lng(other)
  }

  private def arr(body: String): List[JValue] = JsonMethods.parse(body) match {
    case JArray(items) => items
    case other => throw new IllegalArgumentException(s"expected JSON array, got $other")
  }

  /** Kline payloads are arrays of positional arrays. */
  def parseKlines(body: String): Seq[KlineRecord] = arr(body).map {
    case JArray(f) => KlineRecord(lng(f(0)), num(f(1)), num(f(2)), num(f(3)),
      num(f(4)), num(f(5)), lng(f(6)), num(f(7)), lng(f(8)), num(f(9)), num(f(10)))
    case other => throw new IllegalArgumentException(s"bad kline row: $other")
  }

  def parseMarkPriceKlines(body: String): Seq[MarkPriceKline] = arr(body).map {
    case JArray(f) => MarkPriceKline(lng(f(0)), num(f(1)), num(f(2)), num(f(3)), num(f(4)))
    case other => throw new IllegalArgumentException(s"bad kline row: $other")
  }

  def parseIndexPriceKlines(body: String): Seq[IndexPriceKline] = arr(body).map {
    case JArray(f) => IndexPriceKline(lng(f(0)), num(f(1)), num(f(2)), num(f(3)), num(f(4)))
    case other => throw new IllegalArgumentException(s"bad kline row: $other")
  }

  def parsePremiumIndexKlines(body: String): Seq[PremiumIndexKline] = arr(body).map {
    case JArray(f) => PremiumIndexKline(lng(f(0)), num(f(1)), num(f(2)), num(f(3)), num(f(4)))
    case other => throw new IllegalArgumentException(s"bad kline row: $other")
  }

  def parseAggTrades(body: String): Seq[AggTradeRecord] = arr(body).map { item =>
    AggTradeRecord(lng(item \ "a"), num(item \ "p"), num(item \ "q"),
      lng(item \ "f"), lng(item \ "l"), lng(item \ "T"),
      (item \ "m") == JBool(true))
  }

  def parseBookTicker(body: String): BookTickerSnapshot = {
    val j = JsonMethods.parse(body)
    BookTickerSnapshot(num(j \ "bidPrice"), num(j \ "bidQty"),
      num(j \ "askPrice"), num(j \ "askQty"), lngOr(j \ "time", 0L))
  }

  def parsePremiumIndex(body: String): PremiumSnapshot = {
    val j = JsonMethods.parse(body)
    val predicted = (j \ "predictedFundingRate") match {
      case JNothing | JNull => 0.0
      case v                => num(v)
    }
    PremiumSnapshot(num(j \ "markPrice"), num(j \ "indexPrice"),
      num(j \ "lastFundingRate"), lngOr(j \ "nextFundingTime", 0L),
      predicted, lngOr(j \ "time", 0L))
  }

  def parseOpenInterest(body: String): OpenInterestSnapshot = {
    val j = JsonMethods.parse(body)
    OpenInterestSnapshot((j \ "symbol").values.toString,
      num(j \ "openInterest"), lngOr(j \ "time", 0L))
  }

  def parseDepth(symbol: String, body: String): DepthSnapshot = {
    val j = JsonMethods.parse(body)
    def levels(field: String): Seq[(Double, Double)] = (j \ field) match {
      case JArray(rows) => rows.map {
        case JArray(List(p, q)) => (num(p), num(q))
        case other => throw new IllegalArgumentException(s"bad depth level: $other")
      }
      case _ => Nil
    }
    DepthSnapshot(symbol.toUpperCase, lng(j \ "lastUpdateId"),
      levels("bids"), levels("asks"),
      lngOr(j \ "E", 0L), lngOr(j \ "T", 0L))
  }

  def parseLsRatios(body: String): Seq[LsRatioRecord] = arr(body).map { item =>
    LsRatioRecord((item \ "symbol").values.toString, lng(item \ "timestamp"),
      num(item \ "longShortRatio"), num(item \ "longAccount"),
      num(item \ "shortAccount"))
  }

  def parseOpenInterestHist(body: String): Seq[OpenInterestHistRecord] =
    arr(body).map { item =>
      OpenInterestHistRecord((item \ "symbol").values.toString,
        num(item \ "sumOpenInterest"), num(item \ "sumOpenInterestValue"),
        lng(item \ "timestamp"))
    }

  def parseFundingRate(body: String): Seq[FundingRateRecord] = arr(body).map { item =>
    val markPrice = (item \ "markPrice") match {
      case JNothing | JNull | JString("") => None
      case v                              => Some(num(v))
    }
    FundingRateRecord((item \ "symbol").values.toString,
      num(item \ "fundingRate"), lng(item \ "fundingTime"), markPrice)
  }

  // -------------------------------------------------------------- client

  /** The typed endpoint surface over the retrying transport. Request
    * param handling mirrors `rest.py` exactly (symbol uppercased, ms
    * epoch bounds, per-endpoint page caps, optional bounds left off the
    * query when absent). */
  final class BinanceEndpoints(client: RetryingClient) {

    private def windowParams(symbol: String, startMs: Long, endMs: Long,
                             limit: Int, interval: Option[String] = None,
                             symbolKey: String = "symbol"): Map[String, String] =
      Map(symbolKey -> symbol.toUpperCase,
          "startTime" -> startMs.toString,
          "endTime" -> endMs.toString,
          "limit" -> limit.toString) ++ interval.map("interval" -> _)

    private def optionalWindow(symbol: String, period: Option[String],
                               startMs: Option[Long], endMs: Option[Long],
                               limit: Int): Map[String, String] =
      Map("symbol" -> symbol.toUpperCase, "limit" -> limit.toString) ++
        period.map("period" -> _) ++
        startMs.map(s => "startTime" -> s.toString) ++
        endMs.map(e => "endTime" -> e.toString)

    def klines(symbol: String, startMs: Long, endMs: Long,
               interval: String = "1m", limit: Int = 1500): Seq[KlineRecord] =
      parseKlines(client.get("/fapi/v1/klines",
        windowParams(symbol, startMs, endMs, limit, Some(interval))))

    def markPriceKlines(symbol: String, startMs: Long, endMs: Long,
                        interval: String = "1m", limit: Int = 1500): Seq[MarkPriceKline] =
      parseMarkPriceKlines(client.get("/fapi/v1/markPriceKlines",
        windowParams(symbol, startMs, endMs, limit, Some(interval))))

    def indexPriceKlines(symbol: String, startMs: Long, endMs: Long,
                         interval: String = "1m", limit: Int = 1500): Seq[IndexPriceKline] =
      parseIndexPriceKlines(client.get("/fapi/v1/indexPriceKlines",
        windowParams(symbol, startMs, endMs, limit, Some(interval), symbolKey = "pair")))

    def premiumIndexKlines(symbol: String, startMs: Long, endMs: Long,
                           interval: String = "1m", limit: Int = 1500): Seq[PremiumIndexKline] =
      parsePremiumIndexKlines(client.get("/fapi/v1/premiumIndexKlines",
        windowParams(symbol, startMs, endMs, limit, Some(interval))))

    def aggTrades(symbol: String, startMs: Long, endMs: Long,
                  limit: Int = 1000): Seq[AggTradeRecord] =
      parseAggTrades(client.get("/fapi/v1/aggTrades",
        windowParams(symbol, startMs, endMs, limit)))

    def bookTicker(symbol: String): BookTickerSnapshot =
      parseBookTicker(client.get("/fapi/v1/ticker/bookTicker",
        Map("symbol" -> symbol.toUpperCase)))

    def premiumIndex(symbol: String): PremiumSnapshot =
      parsePremiumIndex(client.get("/fapi/v1/premiumIndex",
        Map("symbol" -> symbol.toUpperCase)))

    def openInterest(symbol: String): OpenInterestSnapshot =
      parseOpenInterest(client.get("/fapi/v1/openInterest",
        Map("symbol" -> symbol.toUpperCase)))

    def depth(symbol: String, limit: Int = 1000): DepthSnapshot =
      parseDepth(symbol, client.get("/fapi/v1/depth",
        Map("symbol" -> symbol.toUpperCase, "limit" -> limit.toString)))

    def topTraderLongShortAccountRatio(symbol: String, period: String = "5m",
                                       startMs: Option[Long] = None,
                                       endMs: Option[Long] = None,
                                       limit: Int = 500): Seq[LsRatioRecord] =
      parseLsRatios(client.get("/futures/data/topLongShortAccountRatio",
        optionalWindow(symbol, Some(period), startMs, endMs, limit)))

    def globalLongShortAccountRatio(symbol: String, period: String = "5m",
                                    startMs: Option[Long] = None,
                                    endMs: Option[Long] = None,
                                    limit: Int = 500): Seq[LsRatioRecord] =
      parseLsRatios(client.get("/futures/data/globalLongShortAccountRatio",
        optionalWindow(symbol, Some(period), startMs, endMs, limit)))

    def topTraderLongShortPositionRatio(symbol: String, period: String = "5m",
                                        startMs: Option[Long] = None,
                                        endMs: Option[Long] = None,
                                        limit: Int = 500): Seq[LsRatioRecord] =
      parseLsRatios(client.get("/futures/data/topLongShortPositionRatio",
        optionalWindow(symbol, Some(period), startMs, endMs, limit)))

    def openInterestHist(symbol: String, period: String = "5m",
                         startMs: Option[Long] = None,
                         endMs: Option[Long] = None,
                         limit: Int = 500): Seq[OpenInterestHistRecord] =
      parseOpenInterestHist(client.get("/futures/data/openInterestHist",
        optionalWindow(symbol, Some(period), startMs, endMs, limit)))

    def fundingRate(symbol: String, startMs: Option[Long] = None,
                    endMs: Option[Long] = None,
                    limit: Int = 1000): Seq[FundingRateRecord] =
      parseFundingRate(client.get("/fapi/v1/fundingRate",
        optionalWindow(symbol, None, startMs, endMs, limit)))
  }
}
