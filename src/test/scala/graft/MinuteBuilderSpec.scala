package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.MinuteBuilder
import graft.schema.CanonicalSchema

/** Golden values ported from reference `tests/test_transform_engine.py`. */
class MinuteBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def kline(openTimeMs: Long, open: Double = 100.0, high: Double = 101.0,
                    low: Double = 99.0, close: Double = 100.5,
                    volBtc: Double = 2.0, volUsdt: Double = 200000.0,
                    tc: Long = 20, tbBtc: Double = 1.1, tbUsdt: Double = 110000.0) =
    (openTimeMs, open, high, low, close, volBtc, volUsdt, tc, tbBtc, tbUsdt)

  private def klinesDf(rows: Seq[(Long, Double, Double, Double, Double, Double, Double, Long, Double, Double)]): DataFrame =
    rows.toDF("open_time", "open", "high", "low", "close", "volume_btc",
      "volume_usdt", "trade_count", "taker_buy_vol_btc", "taker_buy_vol_usdt")

  private def markDf(rows: Seq[(Long, Double, Double)]): DataFrame =
    rows.toDF("open_time", "mark_price_open", "mark_price_close")

  private def indexDf(rows: Seq[(Long, Double, Double)]): DataFrame =
    rows.toDF("open_time", "index_price_open", "index_price_close")

  test("single kline minute → 66 canonical columns, vwap falls back to close (test_transform_engine.py:15-64)") {
    val start = instant("2026-01-15T10:00:00Z")
    val frame = MinuteBuilder.buildCanonicalFrame(spark, start, start,
      klines = Some(klinesDf(Seq(kline(start.toEpochMilli)))),
      markPriceKlines = Some(markDf(Seq((start.toEpochMilli, 100.1, 100.4)))),
      indexPriceKlines = Some(indexDf(Seq((start.toEpochMilli, 100.0, 100.2)))))
    val rows = frame.collect()
    assert(rows.length == 1)
    assert(frame.columns.toSeq == CanonicalSchema.columnNames)
    val r = rows.head
    def v(c: String): Any = r.get(frame.columns.indexOf(c))
    assert(v("vwap_1m") == v("close"))
    assert(v("open") == 100.0)
    assert(v("avg_trade_size_btc") == 2.0 / 20)
    // premium_index = mark/index - 1
    assert(math.abs(v("premium_index").asInstanceOf[Double] - (100.4 / 100.2 - 1.0)) < 1e-12)
    // no live features → coverage flags false, gated fields NULL
    assert(v("has_liq") == false && v("liq_long_vol_usdt") == null)
    assert(v("ws_latency_bad") == null)
  }

  test("book-ticker snapshot forward-fills within limit (test_transform_engine.py:66-150)") {
    val start = instant("2026-01-15T10:00:00Z")
    val next = instant("2026-01-15T10:01:00Z")
    val bt = Seq((start.toEpochMilli, 100.0, 10.0, 101.0, 8.0))
      .toDF("event_time", "bid_price", "bid_qty", "ask_price", "ask_qty")
    val frame = MinuteBuilder.buildCanonicalFrame(spark, start, next,
      klines = Some(klinesDf(Seq(kline(start.toEpochMilli), kline(next.toEpochMilli, open = 101.0)))),
      markPriceKlines = Some(markDf(Seq((start.toEpochMilli, 100.1, 100.4), (next.toEpochMilli, 101.1, 101.4)))),
      indexPriceKlines = Some(indexDf(Seq((start.toEpochMilli, 100.0, 100.2), (next.toEpochMilli, 101.0, 101.2)))),
      bookTickerSnapshots = Some(bt))
    val got = frame.select("avg_spread_usdt", "micro_price_close").collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(1.0, 1.0))
    assert(got.forall(!_.isNullAt(1)))
  }

  test("direct OI metrics rows forward-fill (test_transform_engine.py:152-231)") {
    val start = instant("2026-01-15T10:00:00Z")
    val next = instant("2026-01-15T10:01:00Z")
    val metrics = Seq((start.toEpochMilli, 12345.0, 987654321.0))
      .toDF("create_time", "oi_contracts", "oi_value_usdt")
    val frame = MinuteBuilder.buildCanonicalFrame(spark, start, next,
      klines = Some(klinesDf(Seq(kline(start.toEpochMilli), kline(next.toEpochMilli)))),
      metricsRows = Some(metrics))
    val got = frame.select("oi_contracts", "oi_value_usdt").collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(12345.0, 12345.0))
    assert(got.map(_.getDouble(1)).toSeq == Seq(987654321.0, 987654321.0))
  }

  test("L/S ratio as-of with 30-minute freshness gate (test_transform_engine.py:252-358)") {
    val start = instant("2026-01-15T10:00:00Z")
    val end = instant("2026-01-15T10:40:00Z")
    val top = Seq(
      (ms("2026-01-15T10:00:00Z"), 1.2, 0.55, 0.45),
      (ms("2026-01-15T10:05:00Z"), 1.3, 0.57, 0.43)
    ).toDF("data_time", "ratio", "long_account", "short_account")
    val global = Seq(
      (ms("2026-01-15T10:00:00Z"), 1.0, 0.51, 0.49),
      (ms("2026-01-15T10:05:00Z"), 1.1, 0.52, 0.48)
    ).toDF("data_time", "ratio", "long_account", "short_account")
    val klineRows = (0 to 40).map(i => kline(start.plusSeconds(60L * i).toEpochMilli))
    val frame = MinuteBuilder.buildCanonicalFrame(spark, start, end,
      klines = Some(klinesDf(klineRows)),
      topTraderRatioRows = Some(top), globalRatioRows = Some(global))
      .select("timestamp", "top_trader_ls_ratio_acct", "global_ls_ratio_acct",
        "ls_ratio_divergence", "has_ls_ratio")
      .collect().map(r => r.getTimestamp(0).toInstant -> r).toMap

    val r1004 = frame(instant("2026-01-15T10:04:00Z"))
    assert(r1004.getDouble(1) == 1.2 && r1004.getDouble(2) == 1.0 && r1004.getBoolean(4))
    val r1006 = frame(instant("2026-01-15T10:06:00Z"))
    assert(r1006.getDouble(1) == 1.3 && r1006.getDouble(2) == 1.1)
    assert(math.abs(r1006.getDouble(3) - 0.2) < 1e-9)
    val r1036 = frame(instant("2026-01-15T10:36:00Z"))
    assert(r1036.isNullAt(1) && r1036.isNullAt(2) && !r1036.getBoolean(4))
  }

  test("live features preserve 0-vs-NULL semantics (test_transform_engine.py:360-430)") {
    val start = instant("2026-01-15T10:00:00Z")
    val live = spark.createDataFrame(
      java.util.List.of(Row(start.toEpochMilli, false, false, true, false,
        null, null, null, null, null, null, null, null, null, null, null,
        0.0, 0.0, 0L, 0L, null, null, true, null, null)),
      org.apache.spark.sql.types.StructType(Seq(
        ("timestamp_ms", "long"), ("has_ws_latency", "boolean"),
        ("has_depth", "boolean"), ("has_liq", "boolean"), ("has_ls_ratio", "boolean"),
        ("event_time", "long"), ("transact_time", "long"), ("arrival_time", "long"),
        ("latency_engine", "long"), ("latency_network", "long"),
        ("ws_latency_bad", "boolean"), ("update_id_start", "long"),
        ("update_id_end", "long"), ("price_impact_100k", "double"),
        ("impact_fillable", "boolean"), ("depth_degraded", "boolean"),
        ("liq_long_vol_usdt", "double"), ("liq_short_vol_usdt", "double"),
        ("liq_long_count", "long"), ("liq_short_count", "long"),
        ("liq_avg_fill_price", "double"), ("liq_unfilled_ratio", "double"),
        ("liq_unfilled_supported", "boolean"), ("predicted_funding", "double"),
        ("next_funding_time", "long")
      ).map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromDDL(t), nullable = true)
      }))
    val frame = MinuteBuilder.buildCanonicalFrame(spark, start, start,
      klines = Some(klinesDf(Seq(kline(start.toEpochMilli, tbBtc = 1.0, tbUsdt = 100000.0)))),
      markPriceKlines = Some(markDf(Seq((start.toEpochMilli, 100.0, 100.5)))),
      indexPriceKlines = Some(indexDf(Seq((start.toEpochMilli, 100.0, 100.4)))),
      liveFeatures = Some(live))
    val r = frame.collect().head
    def v(c: String): Any = r.get(frame.columns.indexOf(c))
    assert(v("ws_latency_bad") == null)
    assert(v("depth_degraded") == null)
    assert(v("liq_long_vol_usdt") == 0.0 && v("liq_short_vol_usdt") == 0.0)
    assert(v("liq_long_count") == 0L && v("liq_short_count") == 0L)
    assert(v("liq_avg_fill_price") == null && v("liq_unfilled_ratio") == null)
    assert(v("liq_unfilled_supported") == true)
  }

  test("agg trades: whale/retail split, vwap, realized vol (minute_builder.py:195-259)") {
    val start = instant("2026-01-15T10:00:00Z")
    val t0 = start.toEpochMilli
    // (agg_trade_id, price, qty, first_id, last_id, transact_time, is_buyer_maker)
    val trades = Seq(
      (1L, 100.0, 1.0, 1L, 1L, t0 + 1000, false),   // taker buy, notional 100 → retail
      (2L, 101.0, 1000.0, 2L, 2L, t0 + 2000, true), // taker sell, notional 101000 → whale
      (3L, 102.0, 0.005, 3L, 3L, t0 + 3000, false)  // taker buy, notional 0.51 → retail
    ).toDF("agg_trade_id", "price", "qty", "first_trade_id", "last_trade_id",
      "transact_time", "is_buyer_maker")
    val frame = MinuteBuilder.buildCanonicalFrame(spark, start, start,
      klines = Some(klinesDf(Seq(kline(t0)))),
      aggTrades = Some(trades))
    val r = frame.collect().head
    def v(c: String): Any = r.get(frame.columns.indexOf(c))
    val totalNotional = 100.0 * 1.0 + 101.0 * 1000.0 + 102.0 * 0.005
    val totalQty = 1.0 + 1000.0 + 0.005
    assert(math.abs(v("vwap_1m").asInstanceOf[Double] - totalNotional / totalQty) < 1e-9)
    assert(v("max_trade_size_btc") == 1000.0)
    assert(v("count_buy_trades") == 2L && v("count_sell_trades") == 1L)
    assert(v("vol_sell_whale_btc") == 1000.0 && v("vol_buy_whale_btc") == 0.0)
    assert(math.abs(v("vol_buy_retail_btc").asInstanceOf[Double] - 1.005) < 1e-12)
    assert(v("whale_trade_count") == 1L)
    assert(math.abs(v("net_taker_vol_btc").asInstanceOf[Double] - (1.005 - 1000.0)) < 1e-9)
    val expVol = math.sqrt(math.pow(math.log(101.0 / 100.0), 2) + math.pow(math.log(102.0 / 101.0), 2))
    assert(math.abs(v("realized_vol_1m").asInstanceOf[Double] - expVol) < 1e-12)
    // taker_buy_ratio = buy_qty / (buy+sell)
    assert(math.abs(v("taker_buy_ratio").asInstanceOf[Double] - 1.005 / totalQty) < 1e-12)
  }

  test("raw trades reuse the aggTrades minute aggregation; bookDepth normalizes last+mean per (minute, offset) (addendum §I)") {
    val t0 = instant("2026-01-15T10:00:00Z").toEpochMilli
    // identical per-trade content through both loaders' shapes must
    // produce identical minute features (shared aggregation, one rename)
    val agg = Seq(
      (1L, 100.0, 1.0, 1L, 1L, t0 + 1000, false),
      (2L, 101.0, 1000.0, 2L, 2L, t0 + 2000, true),
      (3L, 102.0, 0.005, 3L, 3L, t0 + 3000, false)
    ).toDF("agg_trade_id", "price", "qty", "first_trade_id", "last_trade_id",
      "transact_time", "is_buyer_maker")
    val raw = Seq(
      (1L, 100.0, 1.0, 100.0, t0 + 1000, false),
      (2L, 101.0, 1000.0, 101000.0, t0 + 2000, true),
      (3L, 102.0, 0.005, 0.51, t0 + 3000, false)
    ).toDF("trade_id", "price", "qty", "quote_qty", "transact_time", "is_buyer_maker")
    val a = MinuteBuilder.aggTradeFrame(agg).collect().map(_.toString).sorted
    val b = MinuteBuilder.tradesFrame(raw).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)

    // bookDepth: two snapshots in minute 0 at +1% (last wins for close,
    // both average into mean), one at -1%, one in the next minute
    val depth = Seq(
      (t0 + 1000, 1L, 100.0, 10000.0),
      (t0 + 50000, 1L, 120.0, 12000.0),  // later → close
      (t0 + 2000, -1L, 80.0, 8000.0),
      (t0 + 61000, 1L, 130.0, 13000.0)
    ).toDF("snapshot_time", "percentage", "depth", "notional")
    val out = MinuteBuilder.bookDepthFrame(depth)
      .orderBy("timestamp", "percentage").collect()
    assert(out.length == 3)
    val idx = (c: String) => out.head.schema.fieldIndex(c)
    val m0p1 = out(1) // minute 0, +1%
    assert(m0p1.getDouble(idx("depth_close")) == 120.0)
    assert(m0p1.getDouble(idx("depth_mean")) == 110.0)
    assert(m0p1.getDouble(idx("notional_close")) == 12000.0)
    assert(m0p1.getLong(idx("n_snapshots")) == 2L)
    val m0m1 = out(0) // minute 0, -1%
    assert(m0m1.getDouble(idx("depth_close")) == 80.0 && m0m1.getLong(idx("n_snapshots")) == 1L)
    val m1p1 = out(2) // minute 1, +1%
    assert(m1p1.getDouble(idx("depth_close")) == 130.0)
  }
}
