package graft.service

/** Per-timeframe fetch capability planner (reference
  * `live_data_api_service/capabilities.py:10-95`): decides
  * binance_native / legacy_1m / unavailable per requested timeframe,
  * with the notes the API surfaces in response metadata. */
object Capabilities {

  sealed abstract class CandleFetchMode(val name: String)
  object CandleFetchMode {
    case object NativePreferred extends CandleFetchMode("native_preferred")
    case object AggregateFrom1m extends CandleFetchMode("aggregate_from_1m")
    case object Auto extends CandleFetchMode("auto")
  }

  val BinanceNativeCandleTfs: Set[String] =
    Set("1m", "3m", "5m", "15m", "1h", "4h", "1d")
  val BinanceOiHistTfs: Set[String] =
    Set("5m", "15m", "30m", "1h", "2h", "4h", "6h", "12h", "1d")
  val BinanceLsRatioTfs: Set[String] = BinanceOiHistTfs

  /** API-name → Binance interval. Keys cover BOTH vocabularies — the
    * reference's API aliases ("1hr"/"4hr") and this engine's canonical
    * names from `Timeframes.parse` ("1h"/"4h") — so a caller holding a
    * canonical timeframe name is planned identically. */
  val ApiToBinanceInterval: Map[String, String] = Map(
    "1m" -> "1m", "3m" -> "3m", "5m" -> "5m", "15m" -> "15m",
    "1hr" -> "1h", "1h" -> "1h", "4hr" -> "4h", "4h" -> "4h", "1d" -> "1d")

  final case class FetchPlannerConfig(
      enableNativeBinanceTfCandles: Boolean = true,
      candleFetchMode: CandleFetchMode = CandleFetchMode.NativePreferred,
      allowLegacy1mFallback: Boolean = true,
      allowPartialResponseWithNotes: Boolean = true)

  final case class TimeframeFetchDecision(
      apiName: String, binanceInterval: Option[String], candleSource: String,
      fetchMode: String, fallbackUsed: Boolean, notes: Seq[String] = Nil)

  def planTimeframeFetch(apiName: String,
                         config: FetchPlannerConfig = FetchPlannerConfig()): TimeframeFetchDecision = {
    val interval = ApiToBinanceInterval.get(apiName)
    val nativeSupported = interval.exists(BinanceNativeCandleTfs.contains)

    val wantsNative = config.enableNativeBinanceTfCandles &&
      (config.candleFetchMode == CandleFetchMode.NativePreferred ||
        config.candleFetchMode == CandleFetchMode.Auto)

    if (wantsNative && nativeSupported) {
      val iv = interval.get
      val notes = Seq.newBuilder[String]
      if (!BinanceOiHistTfs.contains(iv))
        notes += s"open_interest_hist_not_supported_for_$iv"
      if (!BinanceLsRatioTfs.contains(iv))
        notes += s"ls_ratio_not_supported_for_$iv"
      if (apiName != "1m")
        notes += "historical_depth_not_available_from_binance_rest"
      TimeframeFetchDecision(apiName, interval, "binance_native", "direct_tf",
        fallbackUsed = false, notes.result())
    } else if (config.allowLegacy1mFallback) {
      val reason =
        if (config.candleFetchMode == CandleFetchMode.AggregateFrom1m)
          "candle_fetch_mode_aggregate_from_1m"
        else if (!nativeSupported) "native_candle_timeframe_not_supported"
        else "native_candle_fetch_disabled"
      TimeframeFetchDecision(apiName, interval, "legacy_1m", "aggregate_from_1m",
        fallbackUsed = true,
        Seq("using_legacy_1m_aggregation_fallback", reason))
    } else
      TimeframeFetchDecision(apiName, interval, "unavailable", "unavailable",
        fallbackUsed = false, Seq("native_candle_timeframe_not_supported"))
  }
}
