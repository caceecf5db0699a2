package graft.service

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.MinuteBuilder
import graft.ops.{AsOf, Ops}
import graft.schema.TimeframeSpec

/** The native Binance candle route — the reference's most-used path for
  * non-local timeframes (`live_data_api_service/service.py`):
  *
  *  - [[nativeKlinesToFrame]] (`_native_klines_to_frame`,
  *    `service.py:1136-1171`): typed kline records → canonical-shaped bar
  *    frame with the kline-derivable fields populated and the live-only
  *    coverage flags pinned false;
  *  - [[enrichNativeFrame]] (`_enrich_native_frame`,
  *    `service.py:1328-1551`): up to 9 auxiliary-series merges onto the
  *    native bars — mark/index/premium-index klines, OI history and the
  *    three L/S ratios via exact-bucket alignment with a one-bar as-of
  *    fallback (`service.py:1259-1301`), funding events as-of backward
  *    at bar close — followed by
  *  - [[addNativeDerivedFields]] (`_add_native_derived_fields`,
  *    `service.py:1188-1257`): premium/divergence/taker-sell recomputes,
  *    sentiment net longs, and bar-over-bar deltas.
  *
  * All alignment is the as-of/window composition from [[graft.ops.AsOf]]
  * — still no Catalyst extension. Unlike the reference's eager per-series
  * populated counts, both alignment passes compose into ONE lazy plan;
  * the exact-vs-fallback decision is a per-partition window gate and the
  * note flags resolve in a single deferred aggregation. At lake scale
  * every join, dedup, as-of, and gate is keyed by `partitionCols`, so a
  * multi-symbol frame enriches per symbol in the same single job.
  */
object NativeCandles {

  /** Auxiliary series for enrichment, already parsed into DataFrames
    * with the [[graft.sources.RestEndpoints]] record column names. Any
    * absent series is skipped with the reference's no-rows note. */
  final case class AuxSeries(markPriceKlines: Option[DataFrame] = None,
                             indexPriceKlines: Option[DataFrame] = None,
                             premiumIndexKlines: Option[DataFrame] = None,
                             openInterestHist: Option[DataFrame] = None,
                             globalLsAccountRatio: Option[DataFrame] = None,
                             topTraderLsAccountRatio: Option[DataFrame] = None,
                             topTraderLsPositionRatio: Option[DataFrame] = None,
                             fundingRate: Option[DataFrame] = None)

  /** @param release unpersists the final cached enrichment stage — call
    *                 it once the frame has been materialized (long-lived
    *                 services would otherwise accumulate one cache entry
    *                 per request; intermediate stages are already
    *                 released as the chain advances) */
  final case class Enriched(frame: DataFrame, notes: Seq[String],
                            release: () => Unit = () => ())

  /** Native kline records → canonical-shaped bar frame
    * (`service.py:1136-1171`): null-safe zero coalescing, vwap with
    * close fallback, taker net/ratio, coverage flags pinned false. */
  def nativeKlinesToFrame(records: DataFrame): DataFrame = {
    val vol = coalesce(col("volume_btc"), lit(0.0))
    val volU = coalesce(col("volume_usdt"), lit(0.0))
    val takerB = coalesce(col("taker_buy_vol_btc"), lit(0.0))
    val takerU = coalesce(col("taker_buy_vol_usdt"), lit(0.0))
    val trades = coalesce(col("trade_count"), lit(0L))
    val bars = records.select(
      MinuteBuilder.toMinuteTs(col("open_time")).as("timestamp"),
      col("open").cast("double").as("open"),
      col("high").cast("double").as("high"),
      col("low").cast("double").as("low"),
      col("close").cast("double").as("close"),
      when(vol > 0, volU / vol).otherwise(col("close")).as("vwap_1m"),
      vol.as("volume_btc"),
      volU.as("volume_usdt"),
      trades.as("trade_count"),
      when(trades > 0, vol / trades.cast("double")).otherwise(0.0)
        .as("avg_trade_size_btc"),
      takerB.as("taker_buy_vol_btc"),
      takerU.as("taker_buy_vol_usdt"),
      (takerB - greatest(vol - takerB, lit(0.0))).as("net_taker_vol_btc"),
      when(vol > 0, takerB / vol).as("taker_buy_ratio"),
      lit(false).as("has_depth"),
      lit(false).as("has_liq"),
      lit(false).as("has_ws_latency"),
      lit(false).as("has_ls_ratio"))
    MinuteBuilder.finalizeSchema(bars)
  }

  /** Align one auxiliary series onto the bars — BOTH passes composed in
    * one lazy plan (no driver actions here):
    *
    *  - exact: series ts floored to the bar bucket, keep-last per
    *    (partition, bucket), left equi-join on (partition, bar open);
    *  - fallback: as-of backward from bar CLOSE over the bucket-floored
    *    series, gated to the matched row's ORIGINAL timestamp being ≤
    *    one bar old (`alignment.py:77-92`; age is measured against
    *    `_source_ts`, not the floored key).
    *
    * The reference decides per frame: if the exact pass populated every
    * bar the exact values stand; otherwise the fallback pass runs and
    * its values WIN wherever the as-of matched (aligned wins —
    * `alignment.py:96-103`, including exact-matched bars: that override
    * is how period-END-stamped series attach at bucket boundaries).
    * Here that whole-frame gate is a per-partition window min, so a
    * multi-symbol frame gates each symbol independently.
    *
    * `flagCol` is left on the result: true on rows the fallback
    * populated that the exact pass could not — `max(flagCol)` is the
    * reference's `fallbackPopulated > populated` note condition,
    * evaluated later in ONE deferred aggregation over all series.
    *
    * @param valueMap (source column in `series`, target column on bars)
    */
  private def alignSeriesLazy(bars: DataFrame, series: DataFrame,
                              seriesTs: String,
                              valueMap: Seq[(String, String)],
                              barMs: Long, partitionCols: Seq[String],
                              flagCol: String): DataFrame = {
    val srcOrig = "__src_orig_ms"
    val tmpE = valueMap.map { case (_, tgt) => s"__exact_$tgt" }
    val tmpA = valueMap.map { case (_, tgt) => s"__asof_$tgt" }
    val tsMs = epochMs(series, seriesTs)
    val floorTs = timestamp_millis((tsMs - pmod(tsMs, lit(barMs))).cast("long"))

    // exact pass: renamed partition keys avoid join ambiguity
    val xp = partitionCols.map(c => s"__xp_$c")
    val exactPrep = series.select(
      (partitionCols.zip(xp).map { case (c, x) => col(c).as(x) } ++
        (floorTs.as("__aux_ts") :: tsMs.as(srcOrig) :: Nil) ++
        valueMap.zip(tmpE).map { case ((src, _), t) => col(src).as(t) }): _*)
    val exactDedup = Ops.dedupKeepLast(exactPrep, xp :+ "__aux_ts", Seq(col(srcOrig)))
      .drop(srcOrig)
    val exactCond = (partitionCols.zip(xp).map { case (c, x) => col(c) === col(x) } :+
      (col("timestamp") === col("__aux_ts"))).reduce(_ && _)
    val exactJoined = bars.join(exactDedup, exactCond, "left")
      .drop(("__aux_ts" +: xp): _*)

    // fallback pass: bucketed as-of backward at bar close, per partition
    val asofPrep = series.select(
      (partitionCols.map(col) ++ (floorTs.as("__aux_join_ts") :: tsMs.as(srcOrig) :: Nil) ++
        valueMap.zip(tmpA).map { case ((src, _), t) => col(src).as(t) }): _*)
    val asofDedup = Ops.dedupKeepLast(asofPrep, partitionCols :+ "__aux_join_ts",
      Seq(col(srcOrig)))
    val closeKey = "__bar_close"
    val withClose = exactJoined.withColumn(closeKey,
      timestamp_millis(unix_millis(col("timestamp")) + barMs))
    val joined = AsOf.asofJoinBackwardBucketed(
      withClose, asofDedup,
      leftOn = closeKey, rightOn = "__aux_join_ts",
      valueCols = tmpA :+ srcOrig, toleranceMs = barMs,
      partitionBy = partitionCols)
    // age gate vs the matched row's original timestamp
    val fresh = unix_millis(col(closeKey)) - col(srcOrig) <= barMs

    // merged candidates: exact (over any existing target) and
    // asof-wins-over-exact (the fallback-frame semantics)
    val evCols = valueMap.map { case (_, tgt) => s"__ev_$tgt" }
    val avCols = valueMap.map { case (_, tgt) => s"__av_$tgt" }
    val merged = valueMap.zip(tmpE).zip(tmpA).foldLeft(joined) {
      case (df, (((_, tgt), te), ta)) =>
        val exactVal =
          if (df.columns.contains(tgt)) coalesce(col(te), col(tgt)) else col(te)
        df.withColumn(s"__ev_$tgt", exactVal)
          .withColumn(s"__av_$tgt", coalesce(when(fresh, col(ta)), exactVal))
    }
    val exactAllSet = evCols.map(col(_).isNotNull).reduce(_ && _)
    val finalAllSet = avCols.map(col(_).isNotNull).reduce(_ && _)
    val w = Window.partitionBy(partitionCols.map(col): _*)
    val gated = merged.withColumn("__exact_full",
      min(when(exactAllSet, 1).otherwise(0)).over(w) === 1)
    val out = valueMap.foldLeft(gated) { case (df, (_, tgt)) =>
      df.withColumn(tgt,
        when(col("__exact_full"), col(s"__ev_$tgt")).otherwise(col(s"__av_$tgt")))
    }.withColumn(flagCol, !col("__exact_full") && finalAllSet && !exactAllSet)
    out.drop((tmpE ++ tmpA ++ evCols ++ avCols ++
      Seq(closeKey, srcOrig, "__exact_full")): _*)
  }

  /** Record timestamps arrive as epoch-ms longs from the REST parsers
    * but as TimestampType from lake reads — accept both. */
  private def epochMs(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_millis(col(c))
      case _ => col(c).cast("long")
    }

  /** The 9 enrichment merges (`service.py:1328-1551`), in reference
    * order, with the reference's notes vocabulary. OI history and L/S
    * ratios only exist for the Binance-supported intervals. */
  def enrichNativeFrame(bars: DataFrame, aux: AuxSeries, spec: TimeframeSpec,
                        interval: String,
                        partitionCols: Seq[String] = Nil): Enriched = {
    val barMs = spec.fixedMinutes.getOrElse(
      throw new IllegalArgumentException(
        s"native enrichment needs a fixed-length timeframe, got ${spec.name}")) * 60000L
    // notes are assembled AFTER the single deferred flag aggregation;
    // Fixed entries are unconditional, FallbackIf entries depend on the
    // series' fallback flag (the reference's populated-count condition)
    sealed trait NoteEntry
    final case class Fixed(note: String) extends NoteEntry
    final case class FallbackIf(flagCol: String, note: String) extends NoteEntry
    val plan = scala.collection.mutable.Buffer[NoteEntry]()
    val flagCols = scala.collection.mutable.Buffer[String]()
    var result = bars

    def exactOrFallback(series: Option[DataFrame], seriesTs: String,
                        valueMap: Seq[(String, String)], prefix: String,
                        noRowsNote: String): Unit = series match {
      case Some(s) =>
        val flagCol = s"__fb_used_$prefix"
        result = alignSeriesLazy(result, s, seriesTs, valueMap, barMs,
          partitionCols, flagCol)
        flagCols += flagCol
        plan += Fixed(s"${prefix}_alignment_exact_timestamp")
        plan += FallbackIf(flagCol, s"${prefix}_alignment_asof_backward_max_age_1bar")
      case None => plan += Fixed(noRowsNote)
    }

    exactOrFallback(aux.markPriceKlines, "open_time",
      Seq("mark_price_open" -> "mark_price_open",
          "mark_price_close" -> "mark_price_close"),
      "mark_price", "mark_price_klines_no_rows")
    exactOrFallback(aux.indexPriceKlines, "open_time",
      Seq("index_price_open" -> "index_price_open",
          "index_price_close" -> "index_price_close"),
      "index_price", "index_price_klines_no_rows")
    exactOrFallback(aux.premiumIndexKlines, "open_time",
      Seq("premium_index_close" -> "premium_index"),
      "premium_index", "premium_index_klines_no_rows")

    if (Capabilities.BinanceOiHistTfs.contains(interval))
      exactOrFallback(aux.openInterestHist, "create_time",
        Seq("oi_contracts" -> "oi_contracts", "oi_value_usdt" -> "oi_value_usdt"),
        "oi_hist", "oi_hist_no_rows")

    if (Capabilities.BinanceLsRatioTfs.contains(interval)) {
      exactOrFallback(aux.globalLsAccountRatio, "data_time",
        Seq("ratio" -> "global_ls_ratio_acct"),
        "global_long_short_account_ratio", "global_ls_ratio_no_rows")
      exactOrFallback(aux.topTraderLsAccountRatio, "data_time",
        Seq("ratio" -> "top_trader_ls_ratio_acct"),
        "top_trader_long_short_account_ratio", "top_trader_ls_ratio_no_rows")
      exactOrFallback(aux.topTraderLsPositionRatio, "data_time",
        Seq("long_account" -> "top_trader_long_pct",
            "short_account" -> "top_trader_short_pct"),
        "top_trader_long_short_position_ratio", "top_trader_position_ratio_no_rows")
    }

    aux.fundingRate match {
      case Some(funding) =>
        // funding settlements are an EVENT series: last known value as of
        // bar close, unbounded backward (service.py:1477-1488)
        val f = funding.select(
          timestamp_millis(epochMs(funding, "funding_time")).as("__f_ts"),
          col("funding_rate").as("__f_rate"))
        val closeKey = "__bar_close"
        val withClose = result.withColumn(closeKey,
          timestamp_millis(unix_millis(col("timestamp")) + barMs))
        val aligned = AsOf.asofJoinBackward(
          withClose, f,
          leftOn = closeKey, rightOn = "__f_ts",
          valueCols = Seq("__f_rate"), toleranceMs = None,
          partitionBy = partitionCols)
        result = aligned
          .withColumn("funding_rate", coalesce(col("__f_rate"), col("funding_rate")))
          .drop(closeKey, "__f_rate")
        plan += Fixed("funding_rate_aligned_asof_backward")
        plan += Fixed("funding_rate_event_series_aligned_not_native_tf")
      case None => plan += Fixed("funding_rate_no_prior_event_found")
    }
    plan += Fixed("next_funding_time_current_snapshot_only")
    plan += Fixed("predicted_funding_live_ws_only")

    // ONE deferred action resolves every series' fallback note — the
    // reference runs ~2 eager populated-counts per series
    // (service.py:1259-1301); composing both passes lazily collapses
    // ~18 sequential Spark jobs into this single aggregation plus the
    // caller's materialization (which reuses the persisted stage)
    if (flagCols.isEmpty) {
      val notes = plan.collect { case Fixed(n) => n }
      Enriched(addNativeDerivedFields(result, partitionCols), notes.toSeq)
    } else {
      val persisted = result.persist()
      val aggs = flagCols.toSeq.map(f =>
        (max(when(col(f), 1).otherwise(0)) === 1).as(f))
      val row = persisted.agg(aggs.head, aggs.tail: _*).collect()(0)
      val used: Map[String, Boolean] = flagCols.toSeq.zipWithIndex.map { case (f, i) =>
        f -> (!row.isNullAt(i) && row.getBoolean(i))
      }.toMap
      val notes = plan.flatMap {
        case Fixed(n) => Some(n)
        case FallbackIf(f, n) => if (used(f)) Some(n) else None
      }
      Enriched(addNativeDerivedFields(persisted.drop(flagCols.toSeq: _*), partitionCols),
        notes.toSeq, release = () => { persisted.unpersist(); () })
    }
  }

  /** Overlay open-interest HISTORY onto a frame whose granularity is not
    * known statically (reference `_overlay_native_oi_hist`,
    * `service.py:1174-1186`): the bar width is INFERRED from the frame's
    * first two rows ([[QueryService.inferFrameMinutes]] — O4), then the
    * rows align with the standard exact-bucket pass + one-bar as-of
    * fallback. An empty frame or absent series passes through untouched,
    * and the fallback flag is discarded (the reference passes a throwaway
    * notes list here). */
  def overlayOiHist(frame: DataFrame, oiHist: Option[DataFrame],
                    partitionCols: Seq[String] = Nil): DataFrame =
    oiHist match {
      case Some(rows) if !frame.isEmpty =>
        val barMs = QueryService.inferFrameMinutes(frame) * 60000L
        alignSeriesLazy(frame, rows, "create_time",
          Seq("oi_contracts" -> "oi_contracts", "oi_value_usdt" -> "oi_value_usdt"),
          barMs, partitionCols, flagCol = "__fb_used_oi_overlay")
          .drop("__fb_used_oi_overlay")
      case _ => frame
    }

  /** Derived/delta fields appended to the enriched native frame
    * (`service.py:1188-1257`). NULL-gated exactly as the reference:
    * every derived value needs all its inputs non-null. */
  def addNativeDerivedFields(frame: DataFrame,
                             partitionCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy("timestamp")
    def lagOf(c: String): Column = lag(col(c), 1).over(w)
    def d(c: String): Column =
      when(col(c).isNotNull && lagOf(c).isNotNull, col(c) - lagOf(c))

    val pctsOk = col("top_trader_long_pct").isNotNull &&
      col("top_trader_short_pct").isNotNull

    frame
      .withColumn("premium_index",
        when(col("premium_index").isNotNull, col("premium_index"))
          .when(col("index_price_close").isNotNull && col("index_price_close") =!= 0,
            col("mark_price_close") / col("index_price_close") - 1.0))
      .withColumn("ls_ratio_divergence",
        when(col("top_trader_ls_ratio_acct").isNotNull &&
          col("global_ls_ratio_acct").isNotNull,
          col("top_trader_ls_ratio_acct") - col("global_ls_ratio_acct")))
      .withColumn("has_ls_ratio",
        col("global_ls_ratio_acct").isNotNull &&
          col("top_trader_ls_ratio_acct").isNotNull && pctsOk)
      .withColumn("taker_sell_vol_btc",
        when(col("volume_btc").isNotNull && col("taker_buy_vol_btc").isNotNull,
          col("volume_btc") - col("taker_buy_vol_btc")))
      .withColumn("taker_sell_vol_usdt",
        when(col("volume_usdt").isNotNull && col("taker_buy_vol_usdt").isNotNull,
          col("volume_usdt") - col("taker_buy_vol_usdt")))
      .withColumn("realized_vol_bar",
        when(col("close") > 0 && lagOf("close") > 0,
          abs(log(col("close") / lagOf("close")))))
      // sentiment net measures from top-trader position pcts — NOT
      // exchange-wide inventory (service.py:1224-1236)
      .withColumn("net_long", when(pctsOk,
        col("top_trader_long_pct") - col("top_trader_short_pct")))
      .withColumn("net_short", when(pctsOk,
        col("top_trader_short_pct") - col("top_trader_long_pct")))
      .withColumn("delta_oi_contracts", d("oi_contracts"))
      .withColumn("delta_oi_value_usdt", d("oi_value_usdt"))
      .withColumn("delta_funding_rate", d("funding_rate"))
      .withColumn("delta_net_long", d("net_long"))
      .withColumn("delta_net_short", d("net_short"))
  }
}
