package graft.operators

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Ops}
import graft.schema.CanonicalSchema

/** Canonical 1-minute frame builder — Spark re-expression of the
  * reference's `MinuteTransformEngine.build_canonical_frame`
  * (`transforms/minute_builder.py:75-123`): dense minute spine → 9
  * left-joins of per-source minute aggregates → derived columns → fill
  * policies → canonical schema finalize.
  *
  * Inputs are DataFrames with the source-record schemas of FIXTURES.md §1
  * (epoch-ms longs for times). Each source prep is a narrow projection +
  * one hash aggregation keyed by the truncated minute; the spine joins
  * are broadcast-friendly (a builder invocation covers a bounded window,
  * typically one hour per symbol — reference `pipeline/orchestrator.py`).
  * At lake scale many builder calls run as independent partitions.
  */
object MinuteBuilder {

  /** Epoch-ms long → UTC minute-truncated timestamp (the universal key
    * normalizer, reference `minute_builder.py:145-152`). */
  def toMinuteTs(epochMs: Column): Column =
    date_trunc("minute", timestamp_millis(epochMs.cast("long")))

  private def dedupLastByTs(df: DataFrame, order: Column): DataFrame =
    Ops.dedupKeepLast(df, Seq("timestamp"), Seq(order))

  /** klines → per-minute OHLCV (reference `minute_builder.py:154-173`). */
  def klinesFrame(records: DataFrame): DataFrame =
    dedupLastByTs(
      records.withColumn("timestamp", toMinuteTs(col("open_time"))),
      col("open_time"))
      .select("timestamp", "open", "high", "low", "close", "volume_btc",
        "volume_usdt", "trade_count", "taker_buy_vol_btc", "taker_buy_vol_usdt")

  def markPriceFrame(records: DataFrame): DataFrame =
    dedupLastByTs(records.withColumn("timestamp", toMinuteTs(col("open_time"))),
      col("open_time"))
      .select("timestamp", "mark_price_open", "mark_price_close")

  def indexPriceFrame(records: DataFrame): DataFrame =
    dedupLastByTs(records.withColumn("timestamp", toMinuteTs(col("open_time"))),
      col("open_time"))
      .select("timestamp", "index_price_open", "index_price_close")

  /** aggTrades → per-minute trade-shape features (reference
    * `minute_builder.py:195-259`): conditional buy/sell/whale/retail
    * splits, VWAP, per-minute log-return realized vol. */
  def aggTradeFrame(records: DataFrame): DataFrame = {
    val notional = col("price") * col("qty")
    val isBuy = col("is_buyer_maker") === false
    val w = Window.partitionBy("timestamp")
      .orderBy(col("transact_time"), col("agg_trade_id"))
    val trades = records
      .withColumn("timestamp", toMinuteTs(col("transact_time")))
      .withColumn("notional", notional)
      .withColumn("buy_qty", when(isBuy, col("qty")).otherwise(0.0))
      .withColumn("sell_qty", when(!isBuy, col("qty")).otherwise(0.0))
      .withColumn("buy_whale_qty", when(isBuy && col("notional") >= 100000.0, col("qty")).otherwise(0.0))
      .withColumn("sell_whale_qty", when(!isBuy && col("notional") >= 100000.0, col("qty")).otherwise(0.0))
      .withColumn("buy_retail_qty", when(isBuy && col("notional") <= 1000.0, col("qty")).otherwise(0.0))
      .withColumn("sell_retail_qty", when(!isBuy && col("notional") <= 1000.0, col("qty")).otherwise(0.0))
      .withColumn("whale_trade", when(col("notional") >= 100000.0, 1L).otherwise(0L))
      .withColumn("is_buy", when(isBuy, 1L).otherwise(0L))
      .withColumn("is_sell", when(!isBuy, 1L).otherwise(0L))
      .withColumn("log_return", log(col("price")) - log(lag(col("price"), 1).over(w)))

    trades.groupBy("timestamp").agg(
      max(col("transact_time")).as("transact_time"),
      (sum(col("notional")) / sum(col("qty"))).as("vwap_1m"),
      max(col("qty")).as("max_trade_size_btc"),
      sum(col("buy_qty")).as("agg_buy_qty"),
      sum(col("sell_qty")).as("agg_sell_qty"),
      (sum(col("buy_qty")) - sum(col("sell_qty"))).as("net_taker_vol_btc"),
      sum(col("is_buy")).as("count_buy_trades"),
      sum(col("is_sell")).as("count_sell_trades"),
      sum(col("buy_whale_qty")).as("vol_buy_whale_btc"),
      sum(col("sell_whale_qty")).as("vol_sell_whale_btc"),
      sum(col("buy_retail_qty")).as("vol_buy_retail_btc"),
      sum(col("sell_retail_qty")).as("vol_sell_retail_btc"),
      sum(col("whale_trade")).as("whale_trade_count"),
      sqrt(sum(pow(coalesce(col("log_return"), lit(0.0)), 2))).as("realized_vol_1m"))
  }

  /** bookTicker snapshots → per-minute spread/imbalance/depth features
    * (reference `minute_builder.py:261-296`). */
  def bookTickerFrame(records: DataFrame): DataFrame = {
    val spread = col("ask_price") - col("bid_price")
    val mid = (col("ask_price") + col("bid_price")) / 2.0
    val qtySum = col("bid_qty") + col("ask_qty")
    records
      .withColumn("timestamp", toMinuteTs(col("event_time")))
      .withColumn("spread", spread)
      .withColumn("imbalance", (col("bid_qty") - col("ask_qty")) / qtySum)
      .withColumn("spread_pct", spread / mid)
      .withColumn("micro_price",
        (col("bid_price") * col("ask_qty") + col("ask_price") * col("bid_qty")) / qtySum)
      .groupBy("timestamp").agg(
        avg(col("spread")).as("avg_spread_usdt"),
        avg(col("imbalance")).as("bid_ask_imbalance"),
        avg(col("bid_qty")).as("avg_bid_depth"),
        avg(col("ask_qty")).as("avg_ask_depth"),
        avg(col("spread_pct")).as("spread_pct"),
        Ops.lastByOrd(col("micro_price"), col("event_time")).as("micro_price_close"))
  }

  /** Raw `trades` → the same per-minute trade-shape features as
    * [[aggTradeFrame]] — addendum §I classes `aggTrades` and `trades`
    * together ("tick/event streams → bucket by minute and aggregate").
    * Raw rows carry `trade_id` where aggTrades carry `agg_trade_id`;
    * one rename adapts them and the aggregation is SHARED, not
    * duplicated (the per-trade columns price/qty/transact_time/
    * is_buyer_maker coincide by construction of
    * [[graft.sources.VisionLoader.tradesFromZips]]). */
  def tradesFrame(records: DataFrame): DataFrame =
    aggTradeFrame(records.withColumnRenamed("trade_id", "agg_trade_id"))

  /** `bookDepth` snapshots → per-minute depth-at-offset features, one
    * row per (minute, percentage offset) — addendum §I "Snapshots …
    * aggregate per minute with locked rule (last-in-minute or mean)":
    * both locked rules are emitted (close = last snapshot in the
    * minute by snapshot time, mean = minute average) plus the snapshot
    * count for completeness accounting. Downstream spine joins treat
    * each percentage offset as its own column family after a pivot, or
    * keep the long shape for range queries. */
  def bookDepthFrame(records: DataFrame): DataFrame =
    records
      .withColumn("timestamp", toMinuteTs(col("snapshot_time")))
      .groupBy("timestamp", "percentage").agg(
        Ops.lastByOrd(col("depth"), col("snapshot_time")).as("depth_close"),
        Ops.lastByOrd(col("notional"), col("snapshot_time")).as("notional_close"),
        avg(col("depth")).as("depth_mean"),
        avg(col("notional")).as("notional_mean"),
        count(lit(1)).as("n_snapshots"))

  def fundingFrame(records: DataFrame): DataFrame =
    dedupLastByTs(records.withColumn("timestamp", toMinuteTs(col("funding_time"))),
      col("funding_time"))
      .select("timestamp", "funding_rate")

  /** premium-index snapshots → per-minute last snapshot (reference
    * `minute_builder.py:309-327`). */
  def premiumFrame(records: DataFrame): DataFrame =
    records
      .withColumn("timestamp", toMinuteTs(col("event_time")))
      .groupBy("timestamp").agg(
        Ops.lastByOrd(col("predicted_funding").cast("double"), col("event_time"))
          .as("predicted_funding"),
        Ops.lastByOrd(col("next_funding_time").cast("long"), col("event_time"))
          .as("next_funding_time"),
        Ops.lastByOrd(col("last_funding_rate").cast("double"), col("event_time"))
          .as("premium_last_funding_rate"))

  /** metrics rows → per-minute OI; handles both the REST shape
    * (oi_contracts/oi_value_usdt + epoch-ms create_time) and the Vision
    * CSV shape (sums/counts + "yyyy-MM-dd HH:mm:ss" create_time)
    * (reference `minute_builder.py:329-377`). */
  def metricsFrame(records: DataFrame): DataFrame = {
    val cols = records.columns.toSet
    require(cols.contains("create_time"), "metrics rows need create_time")
    val withTs =
      if (records.schema("create_time").dataType == org.apache.spark.sql.types.StringType)
        records.withColumn("timestamp",
          date_trunc("minute", to_timestamp(col("create_time"), "yyyy-MM-dd HH:mm:ss")))
      else records.withColumn("timestamp", toMinuteTs(col("create_time")))

    val withOi =
      if (cols.contains("oi_contracts") || cols.contains("oi_value_usdt")) {
        Seq("oi_contracts", "oi_value_usdt").foldLeft(withTs) { (df, c) =>
          if (df.columns.contains(c)) df
          else df.withColumn(c, lit(null).cast("double"))
        }
      } else {
        val cnt = col("count_toptrader_long_short_ratio")
        withTs
          .withColumn("oi_contracts",
            when(cnt > 0, col("sum_open_interest") / cnt))
          .withColumn("oi_value_usdt",
            when(cnt > 0, col("sum_open_interest_value") / cnt))
      }
    dedupLastByTs(withOi, col("create_time"))
      .select("timestamp", "oi_contracts", "oi_value_usdt")
  }

  /** L/S ratio 5-minute series → minute spine via backward as-of join
    * with 30-minute freshness tolerance (reference
    * `minute_builder.py:409-454`, SURVEY §2.3 J2). */
  def lsRatioFrame(spine: DataFrame, topTrader: Option[DataFrame],
                   global: Option[DataFrame]): DataFrame = {
    val tolMs = 30L * 60 * 1000

    def prep(df: DataFrame, ratioCol: String, withPcts: Boolean): DataFrame = {
      val base = df
        .withColumn("data_timestamp", timestamp_millis(col("data_time").cast("long")))
        .withColumn(ratioCol, col("ratio").cast("double"))
      val pcts =
        if (withPcts && df.columns.contains("long_account"))
          base.withColumn("top_trader_long_pct", col("long_account").cast("double"))
            .withColumn("top_trader_short_pct", col("short_account").cast("double"))
        else if (withPcts)
          base.withColumn("top_trader_long_pct", lit(null).cast("double"))
            .withColumn("top_trader_short_pct", lit(null).cast("double"))
        else base
      pcts
    }

    // bucketed form: same backward+tolerance semantics, but the window
    // shuffle is hash-distributed by tolerance-length time buckets — a
    // bulk backfill over years of minutes never funnels into one task
    val withTop = topTrader match {
      case Some(df) =>
        AsOf.asofJoinBackwardBucketed(spine,
          prep(df, "top_trader_ls_ratio_acct", withPcts = true),
          leftOn = "timestamp", rightOn = "data_timestamp",
          valueCols = Seq("top_trader_ls_ratio_acct", "top_trader_long_pct", "top_trader_short_pct"),
          toleranceMs = tolMs)
      case None =>
        spine.withColumn("top_trader_ls_ratio_acct", lit(null).cast("double"))
          .withColumn("top_trader_long_pct", lit(null).cast("double"))
          .withColumn("top_trader_short_pct", lit(null).cast("double"))
    }
    val withGlobal = global match {
      case Some(df) =>
        AsOf.asofJoinBackwardBucketed(withTop, prep(df, "global_ls_ratio_acct", withPcts = false),
          leftOn = "timestamp", rightOn = "data_timestamp",
          valueCols = Seq("global_ls_ratio_acct"), toleranceMs = tolMs)
      case None =>
        withTop.withColumn("global_ls_ratio_acct", lit(null).cast("double"))
    }
    val both = col("top_trader_ls_ratio_acct").isNotNull &&
      col("global_ls_ratio_acct").isNotNull
    withGlobal
      .withColumn("ls_ratio_divergence",
        when(both, col("top_trader_ls_ratio_acct") - col("global_ls_ratio_acct")))
      .withColumn("has_ls_ratio", both)
  }

  /** Live WS per-minute feature snapshots → keep-last per minute
    * (reference `minute_builder.py:456-489`). Column names mirror
    * `LiveMinuteFeatures` (FIXTURES.md §1). */
  def liveFrame(records: DataFrame): DataFrame = {
    val valueCols = Seq("has_ws_latency", "has_depth", "has_liq", "has_ls_ratio",
      "event_time", "transact_time", "arrival_time", "latency_engine",
      "latency_network", "ws_latency_bad", "update_id_start", "update_id_end",
      "price_impact_100k", "impact_fillable", "depth_degraded",
      "liq_long_vol_usdt", "liq_short_vol_usdt", "liq_long_count",
      "liq_short_count", "liq_avg_fill_price", "liq_unfilled_ratio",
      "liq_unfilled_supported", "predicted_funding", "next_funding_time")
    dedupLastByTs(
      records.withColumn("timestamp", toMinuteTs(col("timestamp_ms"))),
      col("timestamp_ms"))
      .select(("timestamp" +: valueCols).map(col): _*)
  }

  /** Dense minute spine [start, end] inclusive. */
  def minuteSpine(spark: SparkSession, startMinute: Instant, endMinute: Instant): DataFrame = {
    import org.apache.spark.sql.types._
    if (endMinute.isBefore(startMinute))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("timestamp", TimestampType))))
    else
      spark.range(1).select(explode(sequence(
        lit(java.sql.Timestamp.from(startMinute)),
        lit(java.sql.Timestamp.from(endMinute)),
        expr("interval 1 minute"))).as("timestamp"))
  }

  /** Full canonical-frame build. All sources optional; a `None` source
    * contributes its fill-policy defaults. */
  def buildCanonicalFrame(
      spark: SparkSession,
      startMinute: Instant,
      endMinute: Instant,
      klines: Option[DataFrame] = None,
      markPriceKlines: Option[DataFrame] = None,
      indexPriceKlines: Option[DataFrame] = None,
      aggTrades: Option[DataFrame] = None,
      fundingRates: Option[DataFrame] = None,
      bookTickerSnapshots: Option[DataFrame] = None,
      premiumIndexSnapshots: Option[DataFrame] = None,
      metricsRows: Option[DataFrame] = None,
      topTraderRatioRows: Option[DataFrame] = None,
      globalRatioRows: Option[DataFrame] = None,
      liveFeatures: Option[DataFrame] = None,
      maxFfillMinutes: Int = 60): DataFrame = {

    val spine = minuteSpine(spark, startMinute, endMinute)

    def join(base: DataFrame, src: Option[DataFrame]): DataFrame = src match {
      case Some(df) => base.join(df, Seq("timestamp"), "left")
      case None => base
    }

    // live columns that collide with earlier sources get a _live suffix;
    // live wins via coalesce (reference `minute_builder.py:492-498`)
    val liveCollide = Seq("predicted_funding", "next_funding_time", "has_ls_ratio", "transact_time")
    val livePrep = liveFeatures.map { lf =>
      liveCollide.foldLeft(liveFrame(lf))((df, c) => df.withColumnRenamed(c, s"${c}_live"))
    }

    var frame = join(spine, klines.map(klinesFrame))
    frame = join(frame, markPriceKlines.map(markPriceFrame))
    frame = join(frame, indexPriceKlines.map(indexPriceFrame))
    frame = join(frame, aggTrades.map(aggTradeFrame))
    frame = join(frame, bookTickerSnapshots.map(bookTickerFrame))
    frame = join(frame, fundingRates.map(fundingFrame))
    frame = join(frame, premiumIndexSnapshots.map(premiumFrame))
    frame = join(frame, metricsRows.map(metricsFrame))
    frame =
      if (topTraderRatioRows.isDefined || globalRatioRows.isDefined)
        frame.join(
          lsRatioFrame(spine, topTraderRatioRows, globalRatioRows),
          Seq("timestamp"), "left")
      else frame
    frame = join(frame, livePrep)

    frame = deriveColumns(frame)
    frame = applyFillPolicies(frame, maxFfillMinutes)
    finalizeSchema(frame)
  }

  /** Derived columns + null-gating semantics (reference
    * `minute_builder.py:491-622`). The deliberate 0-vs-NULL and
    * False-vs-NULL gates (liq fields NULL unless has_liq, ws_latency_bad
    * NULL unless has_ws_latency) are written as explicit when/otherwise —
    * SURVEY §7.3 risk area. */
  def deriveColumns(frameIn: DataFrame): DataFrame = {
    var frame = frameIn
    // live-wins coalesce for colliding columns
    for (c <- Seq("predicted_funding", "next_funding_time", "has_ls_ratio", "transact_time")) {
      val liveCol = s"${c}_live"
      if (frame.columns.contains(liveCol)) {
        frame =
          (if (frame.columns.contains(c))
             frame.withColumn(c, coalesce(col(liveCol), col(c)))
           else frame.withColumn(c, col(liveCol))).drop(liveCol)
      }
    }

    val defaults: Seq[(String, Column)] = Seq(
      "has_ws_latency" -> lit(false), "has_depth" -> lit(false),
      "has_liq" -> lit(false), "has_ls_ratio" -> lit(false),
      "trade_count" -> lit(0L), "volume_btc" -> lit(0.0),
      "close" -> lit(null).cast("double"), "vwap_1m" -> lit(null).cast("double"),
      "agg_buy_qty" -> lit(0.0), "agg_sell_qty" -> lit(0.0),
      "net_taker_vol_btc" -> lit(0.0), "max_trade_size_btc" -> lit(0.0),
      "count_buy_trades" -> lit(0L), "count_sell_trades" -> lit(0L),
      "vol_buy_whale_btc" -> lit(0.0), "vol_sell_whale_btc" -> lit(0.0),
      "vol_buy_retail_btc" -> lit(0.0), "vol_sell_retail_btc" -> lit(0.0),
      "whale_trade_count" -> lit(0L), "realized_vol_1m" -> lit(0.0),
      "mark_price_close" -> lit(null).cast("double"),
      "index_price_close" -> lit(null).cast("double"),
      "funding_rate" -> lit(null).cast("double"),
      "premium_last_funding_rate" -> lit(null).cast("double"),
      "ws_latency_bad" -> lit(null).cast("boolean"),
      "impact_fillable" -> lit(null).cast("boolean"),
      "depth_degraded" -> lit(null).cast("boolean"),
      "liq_long_vol_usdt" -> lit(null).cast("double"),
      "liq_short_vol_usdt" -> lit(null).cast("double"),
      "liq_long_count" -> lit(null).cast("long"),
      "liq_short_count" -> lit(null).cast("long"),
      "liq_avg_fill_price" -> lit(null).cast("double"),
      "liq_unfilled_ratio" -> lit(null).cast("double"),
      "liq_unfilled_supported" -> lit(null).cast("boolean"),
      "top_trader_ls_ratio_acct" -> lit(null).cast("double"),
      "global_ls_ratio_acct" -> lit(null).cast("double"),
      "ls_ratio_divergence" -> lit(null).cast("double"),
      "top_trader_long_pct" -> lit(null).cast("double"),
      "top_trader_short_pct" -> lit(null).cast("double"))
    for ((name, default) <- defaults)
      if (!frame.columns.contains(name)) frame = frame.withColumn(name, default)

    val hasLiq = coalesce(col("has_liq"), lit(false))
    val bothRatios = col("top_trader_ls_ratio_acct").isNotNull &&
      col("global_ls_ratio_acct").isNotNull

    frame
      .withColumn("avg_trade_size_btc",
        when(coalesce(col("trade_count"), lit(0L)) > 0,
          col("volume_btc") / col("trade_count")).otherwise(0.0))
      .withColumn("taker_buy_ratio",
        when(col("agg_buy_qty") + col("agg_sell_qty") > 0,
          col("agg_buy_qty") / (col("agg_buy_qty") + col("agg_sell_qty"))))
      .withColumn("premium_index",
        when(col("index_price_close") =!= 0,
          col("mark_price_close") / col("index_price_close") - 1.0))
      .withColumn("funding_rate",
        coalesce(col("funding_rate"), col("premium_last_funding_rate")))
      .withColumn("vwap_1m",
        when(col("vwap_1m").isNull, col("close")).otherwise(col("vwap_1m")))
      .withColumn("net_taker_vol_btc", coalesce(col("net_taker_vol_btc"), lit(0.0)))
      .withColumn("max_trade_size_btc", coalesce(col("max_trade_size_btc"), lit(0.0)))
      .withColumn("count_buy_trades", coalesce(col("count_buy_trades"), lit(0L)))
      .withColumn("count_sell_trades", coalesce(col("count_sell_trades"), lit(0L)))
      .withColumn("vol_buy_whale_btc", coalesce(col("vol_buy_whale_btc"), lit(0.0)))
      .withColumn("vol_sell_whale_btc", coalesce(col("vol_sell_whale_btc"), lit(0.0)))
      .withColumn("vol_buy_retail_btc", coalesce(col("vol_buy_retail_btc"), lit(0.0)))
      .withColumn("vol_sell_retail_btc", coalesce(col("vol_sell_retail_btc"), lit(0.0)))
      .withColumn("whale_trade_count", coalesce(col("whale_trade_count"), lit(0L)))
      .withColumn("realized_vol_1m", coalesce(col("realized_vol_1m"), lit(0.0)))
      .withColumn("has_ls_ratio",
        when(bothRatios, lit(true)).otherwise(coalesce(col("has_ls_ratio"), lit(false))))
      .withColumn("has_ws_latency", coalesce(col("has_ws_latency"), lit(false)))
      .withColumn("has_depth", coalesce(col("has_depth"), lit(false)))
      .withColumn("has_liq", coalesce(col("has_liq"), lit(false)))
      .withColumn("ws_latency_bad",
        when(coalesce(col("has_ws_latency"), lit(false)),
          coalesce(col("ws_latency_bad"), lit(false))))
      .withColumn("depth_degraded",
        when(coalesce(col("has_depth"), lit(false)),
          coalesce(col("depth_degraded"), lit(false))))
      .withColumn("liq_unfilled_supported",
        when(hasLiq, coalesce(col("liq_unfilled_supported"), lit(false))))
      .withColumn("liq_long_vol_usdt", when(hasLiq, coalesce(col("liq_long_vol_usdt"), lit(0.0))))
      .withColumn("liq_short_vol_usdt", when(hasLiq, coalesce(col("liq_short_vol_usdt"), lit(0.0))))
      .withColumn("liq_long_count", when(hasLiq, coalesce(col("liq_long_count"), lit(0L))))
      .withColumn("liq_short_count", when(hasLiq, coalesce(col("liq_short_count"), lit(0L))))
      .withColumn("liq_avg_fill_price", when(hasLiq, col("liq_avg_fill_price")))
      .withColumn("liq_unfilled_ratio",
        when(hasLiq, when(col("liq_unfilled_supported") === true, col("liq_unfilled_ratio"))))
      .withColumn("ls_ratio_divergence",
        when(bothRatios, col("top_trader_ls_ratio_acct") - col("global_ls_ratio_acct")))
  }

  /** Bounded forward-fill of snapshot columns (reference
    * `minute_builder.py:624-642`; limit = max_ffill_minutes). */
  def applyFillPolicies(frame: DataFrame, maxFfillMinutes: Int): DataFrame = {
    val ffillCols = Seq("micro_price_close", "avg_spread_usdt", "bid_ask_imbalance",
      "avg_bid_depth", "avg_ask_depth", "spread_pct", "oi_contracts",
      "oi_value_usdt", "funding_rate")
    ffillCols.filter(frame.columns.contains).foldLeft(frame) { (df, c) =>
      df.withColumn(c,
        Ops.boundedFfill(col(c), Seq(col("timestamp")), Some(maxFfillMinutes)))
    }
  }

  /** Strict canonical cast/select in registry order (reference
    * `minute_builder.py:644-651`). */
  def finalizeSchema(frameIn: DataFrame): DataFrame = {
    var frame = frameIn
    for (c <- CanonicalSchema.columnNames)
      if (!frame.columns.contains(c)) frame = frame.withColumn(c, lit(null))
    frame.select(CanonicalSchema.columns.map(c =>
      col(c.name).cast(c.sparkType).as(c.name)): _*)
      .orderBy("timestamp")
  }
}
