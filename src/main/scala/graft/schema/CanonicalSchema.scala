package graft.schema

import java.security.MessageDigest

import org.apache.spark.sql.types._

/** Support class of a canonical column (reference `core/enums.py:6-10`). */
sealed abstract class SupportClass(val name: String)
object SupportClass {
  case object HardRequired extends SupportClass("HARD_REQUIRED")
  case object BackfillAvailable extends SupportClass("BACKFILL_AVAILABLE")
  case object LiveOnly extends SupportClass("LIVE_ONLY")
  case object Optional extends SupportClass("OPTIONAL")
}

/** One canonical column (reference `core/schema.py:11-18`): the registry
  * drives schema finalization, DQ gates and the schema hash. `dtype` uses
  * the reference's 5-type vocabulary (BigInt/Int/Float/Bool/Datetime →
  * Long/Long/Double/Boolean/Timestamp, `schema.py:336-342`). */
final case class ColumnSpec(
    name: String,
    dtype: String,
    source: String,
    supportClass: SupportClass,
    fillPolicy: String) {

  def sparkType: DataType = dtype match {
    case "BigInt" | "Int" => LongType
    case "Float" => DoubleType
    case "Bool" => BooleanType
    case "Datetime" => TimestampType // ms precision ⊂ Spark µs; session TZ=UTC
    case "String" => StringType
    case other => throw new IllegalArgumentException(s"unknown dtype $other")
  }

  def field: StructField =
    StructField(name, sparkType, nullable = supportClass != SupportClass.HardRequired,
      metadata = new MetadataBuilder()
        .putString("source", source)
        .putString("support_class", supportClass.name)
        .putString("fill_policy", fillPolicy)
        .build())
}

/** The canonical 66-column 1-minute schema registry (reference
  * `core/schema.py:20-333`; column count asserted by
  * `tests/test_schema_registry.py:5-8`). */
object CanonicalSchema {
  import SupportClass._

  val columns: Seq[ColumnSpec] = Seq(
    ColumnSpec("has_ws_latency", "Bool", "coverage", LiveOnly, "False when unavailable"),
    ColumnSpec("has_depth", "Bool", "coverage", LiveOnly, "False when unavailable"),
    ColumnSpec("has_liq", "Bool", "coverage", LiveOnly, "False when unavailable"),
    ColumnSpec("has_ls_ratio", "Bool", "coverage", BackfillAvailable, "False when unavailable"),
    ColumnSpec("event_time", "BigInt", "websocket", LiveOnly, "NULL if not collected"),
    ColumnSpec("transact_time", "BigInt", "agg_trades_or_mark_price", BackfillAvailable, "NULL if no trade"),
    ColumnSpec("arrival_time", "BigInt", "local_capture", LiveOnly, "NULL historically"),
    ColumnSpec("latency_engine", "Int", "derived", LiveOnly, "NULL if missing inputs"),
    ColumnSpec("latency_network", "Int", "derived", LiveOnly, "NULL if missing inputs"),
    ColumnSpec("ws_latency_bad", "Bool", "derived", LiveOnly, "False unless out-of-range"),
    ColumnSpec("update_id_start", "BigInt", "depth_update", LiveOnly, "NULL if no depth"),
    ColumnSpec("update_id_end", "BigInt", "depth_update", LiveOnly, "NULL if no depth"),
    ColumnSpec("timestamp", "Datetime", "klines", HardRequired, "no nulls"),
    ColumnSpec("open", "Float", "klines", HardRequired, "no nulls"),
    ColumnSpec("high", "Float", "klines", HardRequired, "no nulls"),
    ColumnSpec("low", "Float", "klines", HardRequired, "no nulls"),
    ColumnSpec("close", "Float", "klines", HardRequired, "no nulls"),
    ColumnSpec("vwap_1m", "Float", "agg_trades", BackfillAvailable, "close if no qty"),
    ColumnSpec("micro_price_close", "Float", "book_ticker", BackfillAvailable, "NULL if no snapshot"),
    ColumnSpec("volume_btc", "Float", "klines", HardRequired, "0 allowed"),
    ColumnSpec("volume_usdt", "Float", "klines", HardRequired, "0 allowed"),
    ColumnSpec("trade_count", "Int", "klines", HardRequired, "0 allowed"),
    ColumnSpec("avg_trade_size_btc", "Float", "derived", BackfillAvailable, "0 if trade_count=0"),
    ColumnSpec("max_trade_size_btc", "Float", "agg_trades", BackfillAvailable, "0 if no trades"),
    ColumnSpec("taker_buy_vol_btc", "Float", "klines_or_agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("taker_buy_vol_usdt", "Float", "klines_or_agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("net_taker_vol_btc", "Float", "agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("count_buy_trades", "Int", "agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("count_sell_trades", "Int", "agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("taker_buy_ratio", "Float", "derived", BackfillAvailable, "NULL if denom=0"),
    ColumnSpec("vol_buy_whale_btc", "Float", "agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("vol_sell_whale_btc", "Float", "agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("vol_buy_retail_btc", "Float", "agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("vol_sell_retail_btc", "Float", "agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("whale_trade_count", "Int", "agg_trades", BackfillAvailable, "0 if none"),
    ColumnSpec("realized_vol_1m", "Float", "agg_trades", BackfillAvailable, "0 if <2 ticks"),
    ColumnSpec("liq_long_vol_usdt", "Float", "force_order_ws_rest", LiveOnly, "NULL unless collected"),
    ColumnSpec("liq_short_vol_usdt", "Float", "force_order_ws_rest", LiveOnly, "NULL unless collected"),
    ColumnSpec("liq_long_count", "Int", "force_order_ws_rest", LiveOnly, "NULL unless collected"),
    ColumnSpec("liq_short_count", "Int", "force_order_ws_rest", LiveOnly, "NULL unless collected"),
    ColumnSpec("liq_avg_fill_price", "Float", "force_order", LiveOnly, "NULL unless collected"),
    ColumnSpec("liq_unfilled_ratio", "Float", "force_order", LiveOnly, "NULL unless collected"),
    ColumnSpec("liq_unfilled_supported", "Bool", "force_order", LiveOnly, "False when unfilled semantics unavailable"),
    ColumnSpec("avg_spread_usdt", "Float", "book_ticker", BackfillAvailable, "ffill within limit"),
    ColumnSpec("bid_ask_imbalance", "Float", "book_ticker", BackfillAvailable, "ffill within limit"),
    ColumnSpec("avg_bid_depth", "Float", "book_ticker", BackfillAvailable, "ffill within limit"),
    ColumnSpec("avg_ask_depth", "Float", "book_ticker", BackfillAvailable, "ffill within limit"),
    ColumnSpec("spread_pct", "Float", "book_ticker", BackfillAvailable, "ffill within limit"),
    ColumnSpec("price_impact_100k", "Float", "depth_book", LiveOnly, "NULL unless collected"),
    ColumnSpec("impact_fillable", "Bool", "depth_book", LiveOnly, "NULL unless collected"),
    ColumnSpec("depth_degraded", "Bool", "depth_sync", LiveOnly, "False unless sync degraded"),
    ColumnSpec("oi_contracts", "Float", "rest_or_metrics", BackfillAvailable, "ffill within limit"),
    ColumnSpec("oi_value_usdt", "Float", "rest_or_metrics", BackfillAvailable, "ffill within limit"),
    ColumnSpec("top_trader_ls_ratio_acct", "Float", "rest_or_metrics", BackfillAvailable, "ffill within limit"),
    ColumnSpec("global_ls_ratio_acct", "Float", "rest_or_metrics", BackfillAvailable, "ffill within limit"),
    ColumnSpec("ls_ratio_divergence", "Float", "derived", BackfillAvailable, "ffill within limit"),
    ColumnSpec("top_trader_long_pct", "Float", "rest_or_metrics", BackfillAvailable, "ffill within limit"),
    ColumnSpec("top_trader_short_pct", "Float", "rest_or_metrics", BackfillAvailable, "ffill within limit"),
    ColumnSpec("mark_price_open", "Float", "mark_price_klines", HardRequired, "no nulls"),
    ColumnSpec("mark_price_close", "Float", "mark_price_klines", HardRequired, "no nulls"),
    ColumnSpec("index_price_open", "Float", "index_price_klines", HardRequired, "no nulls"),
    ColumnSpec("index_price_close", "Float", "index_price_klines", HardRequired, "no nulls"),
    ColumnSpec("premium_index", "Float", "premium_or_index_or_mark", BackfillAvailable, "computed; no nulls if inputs available"),
    ColumnSpec("funding_rate", "Float", "funding_rate_rest_or_premium_index", BackfillAvailable, "ffill settles every 8h"),
    ColumnSpec("predicted_funding", "Float", "ws_mark_price_or_premium_index_rest", LiveOnly, "NULL historically"),
    ColumnSpec("next_funding_time", "BigInt", "ws_mark_price_or_premium_index_rest", LiveOnly, "NULL historically")
  )

  val columnNames: Seq[String] = columns.map(_.name)

  val hardRequired: Seq[String] =
    columns.filter(_.supportClass == HardRequired).map(_.name)

  val liveOnly: Seq[String] =
    columns.filter(_.supportClass == LiveOnly).map(_.name)

  /** LIVE_ONLY boolean coverage flags — bool-OR merged on partition
    * rewrite (reference `writer/atomic.py:65-97`). */
  val liveOnlyBoolFlags: Seq[String] =
    columns.filter(c => c.supportClass == LiveOnly && c.dtype == "Bool").map(_.name)

  val structType: StructType = StructType(columns.map(_.field))

  def sparkTypeOf(name: String): DataType =
    columns.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown column $name"))
      .sparkType

  /** sha256 over `name|dtype|source|class|fill` rows — recorded per
    * written partition (reference `schema.py:365-370`,
    * `writer/atomic.py:113-117`). */
  def schemaHashInput: String =
    columns.map(c => s"${c.name}|${c.dtype}|${c.source}|${c.supportClass.name}|${c.fillPolicy}")
      .mkString("\n")

  def schemaHash: String =
    MessageDigest.getInstance("SHA-256")
      .digest(schemaHashInput.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
