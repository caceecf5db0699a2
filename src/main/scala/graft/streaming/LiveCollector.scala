package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live-collector streaming operators (SURVEY §2.9): minute-keyed
  * accumulation of liquidation and latency features (ST1/A11/A12) as
  * both a batch replay (`mapGroups` over an events table — the
  * historical path, reference `websocket.py:959-1127`) and a Structured
  * Streaming job (`flatMapGroupsWithState` keyed by (symbol, minute)
  * with event-time timeout — the live path, reference
  * `websocket.py:1273-1304,1488-1711`).
  *
  * All math lives in [[MinuteAccumulator]] so batch and streaming paths
  * share one implementation and cannot drift.
  */
object LiveCollector {

  /** forceOrder liquidation event (reference `websocket.py:208-217`). */
  final case class LiquidationEvent(
      symbol: String, eventTime: Long, side: String, price: Double,
      quantity: Double, arrivalTime: Option[Long] = None,
      origQuantity: Option[Double] = None, executedQuantity: Option[Double] = None)

  /** WS latency sample (engine = arrival-event, network = arrival-transact;
    * reference `websocket.py:1521-1528`). */
  final case class LatencySample(
      symbol: String, eventTime: Long, transactTime: Long, arrivalTime: Long)

  /** Per-(symbol, minute) liquidation features (A11). */
  final case class LiqMinuteFeatures(
      symbol: String, timestampMs: Long, hasLiq: Boolean,
      liqLongVolUsdt: Option[Double], liqShortVolUsdt: Option[Double],
      liqLongCount: Option[Long], liqShortCount: Option[Long],
      liqAvgFillPrice: Option[Double], liqUnfilledRatio: Option[Double],
      liqUnfilledSupported: Option[Boolean])

  /** Per-(symbol, minute) latency features (A12). */
  final case class LatencyMinuteFeatures(
      symbol: String, timestampMs: Long, hasWsLatency: Boolean,
      latencyEngine: Option[Long], latencyNetwork: Option[Long],
      wsLatencyBad: Option[Boolean], eventTime: Option[Long],
      transactTime: Option[Long], arrivalTime: Option[Long])

  val LatencyBadThresholdMs = 500L

  def floorToMinuteMs(t: Long): Long = t - (t % 60000L)

  /** Nearest-rank p95 (reference `_p95_int`, `websocket.py:100-105`):
    * rank = max(1, ceil(0.95 n)), 1-indexed. */
  def p95Int(values: Seq[Long]): Option[Long] =
    if (values.isEmpty) None
    else {
      val ordered = values.sorted
      val rank = math.max(1, math.ceil(0.95 * ordered.size).toInt)
      Some(ordered(rank - 1))
    }

  /** Mutable per-minute accumulator — the shared state-transition core
    * (reference `_MinuteAccumulator`, `websocket.py:1273-1304`). */
  final class MinuteAccumulator(unfilledSupported: Boolean) extends Serializable {
    var liqLongVol = 0.0
    var liqShortVol = 0.0
    var liqLongCount = 0L
    var liqShortCount = 0L
    var liqQtyTotal = 0.0
    var liqWeightedPriceSum = 0.0
    var liqEventCount = 0L
    var liqOrigQtyTotal = 0.0
    var liqExecutedQtyTotal = 0.0
    var liqUnfilledSupported: Boolean = unfilledSupported

    var latencyEngine = Vector[Long]()
    var latencyNetwork = Vector[Long]()
    var latencyEventCount = 0L
    var wsLatencyBad = false
    var maxEventTime = Long.MinValue
    var maxTransactTime = Long.MinValue
    var maxArrivalTime = Long.MinValue

    def addLiquidation(e: LiquidationEvent, globallySupported: Boolean): Unit = {
      val notional = e.price * e.quantity
      e.side.toUpperCase match {
        case "SELL" => liqLongVol += notional; liqLongCount += 1
        case "BUY" => liqShortVol += notional; liqShortCount += 1
        case _ =>
      }
      liqQtyTotal += e.quantity
      liqWeightedPriceSum += e.price * e.quantity
      liqEventCount += 1
      if (globallySupported && e.origQuantity.isDefined &&
          e.executedQuantity.isDefined && liqUnfilledSupported) {
        val orig = math.max(e.origQuantity.get, 0.0)
        val exec = math.min(math.max(e.executedQuantity.get, 0.0), orig)
        liqOrigQtyTotal += orig
        liqExecutedQtyTotal += exec
      } else liqUnfilledSupported = false
    }

    def addLatency(s: LatencySample): Unit = {
      val engine = s.arrivalTime - s.eventTime
      val network = s.arrivalTime - s.transactTime
      latencyEngine :+= engine
      latencyNetwork :+= network
      latencyEventCount += 1
      if (engine > LatencyBadThresholdMs || network > LatencyBadThresholdMs)
        wsLatencyBad = true
      maxEventTime = math.max(maxEventTime, s.eventTime)
      maxTransactTime = math.max(maxTransactTime, s.transactTime)
      maxArrivalTime = math.max(maxArrivalTime, s.arrivalTime)
    }

    def liqFeatures(symbol: String, minuteMs: Long, globallySupported: Boolean): LiqMinuteFeatures = {
      val hasLiq = liqEventCount > 0
      if (!hasLiq)
        LiqMinuteFeatures(symbol, minuteMs, hasLiq = false,
          None, None, None, None, None, None, None)
      else {
        val supported = globallySupported && liqUnfilledSupported
        val ratio =
          if (supported && liqOrigQtyTotal > 0)
            Some(math.max(0.0, (liqOrigQtyTotal - liqExecutedQtyTotal) / liqOrigQtyTotal))
          else None
        LiqMinuteFeatures(symbol, minuteMs, hasLiq = true,
          Some(liqLongVol), Some(liqShortVol), Some(liqLongCount), Some(liqShortCount),
          if (liqQtyTotal > 0) Some(liqWeightedPriceSum / liqQtyTotal) else None,
          ratio, Some(supported))
      }
    }

    def latencyFeatures(symbol: String, minuteMs: Long): LatencyMinuteFeatures = {
      val has = latencyEventCount > 0
      if (!has)
        LatencyMinuteFeatures(symbol, minuteMs, hasWsLatency = false,
          None, None, None, None, None, None)
      else
        LatencyMinuteFeatures(symbol, minuteMs, hasWsLatency = true,
          p95Int(latencyEngine), p95Int(latencyNetwork), Some(wsLatencyBad),
          Some(maxEventTime), Some(maxTransactTime), Some(maxArrivalTime))
    }
  }

  // ------------------------------------------------------------- batch path

  /** Batch replay of liquidation events → per-minute features (the
    * store-recovery path, reference `websocket.py:1037-1099`). */
  def liquidationMinuteFeaturesBatch(events: Dataset[LiquidationEvent],
                                     unfilledSupported: Boolean = true): Dataset[LiqMinuteFeatures] = {
    implicit val enc = Encoders.product[LiqMinuteFeatures]
    events.groupByKey(e => (e.symbol, floorToMinuteMs(e.eventTime)))(
      Encoders.product[(String, Long)])
      .mapGroups { (key: (String, Long), it: Iterator[LiquidationEvent]) =>
        val acc = new MinuteAccumulator(unfilledSupported)
        // deterministic event order within the minute
        it.toSeq.sortBy(e => (e.eventTime, e.price, e.quantity))
          .foreach(acc.addLiquidation(_, unfilledSupported))
        acc.liqFeatures(key._1, key._2, unfilledSupported)
      }
  }

  /** Batch replay of latency samples → per-minute features. */
  def latencyMinuteFeaturesBatch(samples: Dataset[LatencySample]): Dataset[LatencyMinuteFeatures] = {
    implicit val enc = Encoders.product[LatencyMinuteFeatures]
    samples.groupByKey(s => (s.symbol, floorToMinuteMs(s.eventTime)))(
      Encoders.product[(String, Long)])
      .mapGroups { (key: (String, Long), it: Iterator[LatencySample]) =>
        val acc = new MinuteAccumulator(true)
        it.toSeq.sortBy(s => (s.eventTime, s.arrivalTime)).foreach(acc.addLatency)
        acc.latencyFeatures(key._1, key._2)
      }
  }

  // --------------------------------------------------------- streaming path

  /** The declarative Structured Streaming form of the liquidation
    * accumulator (ST5/ST6): event-time watermark at the reference's
    * 3-minute safety lag (`core/config.py:19`) + a tumbling 1-minute
    * window aggregation. Append mode: a bar is emitted exactly once,
    * when the watermark passes its close — the windowed counterpart to
    * [[liquidationMinuteFeaturesStream]]'s update-mode accumulator
    * (which re-emits per micro-batch). The weighted fill price and
    * side splits are the same expressions as the batch replay;
    * the order-sensitive unfilled-ratio bookkeeping is sum-based and
    * commutes, so no in-window ordering is needed. */
  def liquidationMinuteFeaturesWindowed(events: Dataset[LiquidationEvent],
                                        unfilledSupported: Boolean = true,
                                        watermarkDelay: String = "3 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    val notional = col("price") * col("quantity")
    events.toDF()
      .withColumn("event_ts", timestamp_millis(col("eventTime")))
      .withWatermark("event_ts", watermarkDelay)
      .groupBy(col("symbol"), window(col("event_ts"), "1 minute").as("w"))
      .agg(
        sum(when(col("side") === "SELL", notional).otherwise(0.0)).as("liqLongVolUsdt"),
        sum(when(col("side") === "BUY", notional).otherwise(0.0)).as("liqShortVolUsdt"),
        sum(when(col("side") === "SELL", 1L).otherwise(0L)).as("liqLongCount"),
        sum(when(col("side") === "BUY", 1L).otherwise(0L)).as("liqShortCount"),
        (sum(notional) / sum(col("quantity"))).as("liqAvgFillPrice"),
        // support demotes when ANY event lacks orig/exec (accumulator
        // parity); totals clamp exec into [0, orig] like addLiquidation
        expr("bool_and(origQuantity IS NOT NULL AND executedQuantity IS NOT NULL)")
          .as("_all_present"),
        sum(greatest(coalesce(col("origQuantity"), lit(0.0)), lit(0.0))).as("_orig"),
        sum(least(greatest(coalesce(col("executedQuantity"), lit(0.0)), lit(0.0)),
          greatest(coalesce(col("origQuantity"), lit(0.0)), lit(0.0)))).as("_exec"))
      .select(col("symbol"),
        unix_millis(col("w.start")).as("timestampMs"),
        lit(true).as("hasLiq"),
        col("liqLongVolUsdt"), col("liqShortVolUsdt"),
        col("liqLongCount"), col("liqShortCount"),
        col("liqAvgFillPrice"),
        when(lit(unfilledSupported) && col("_all_present") && col("_orig") > 0,
          greatest(lit(0.0), (col("_orig") - col("_exec")) / col("_orig")))
          .as("liqUnfilledRatio"),
        (lit(unfilledSupported) && col("_all_present")).as("liqUnfilledSupported"))
  }

  /** Serializable accumulator state for streaming groups. */
  final case class LiqState(
      longVol: Double, shortVol: Double, longCount: Long, shortCount: Long,
      qtyTotal: Double, weightedPriceSum: Double, eventCount: Long,
      origQtyTotal: Double, executedQtyTotal: Double, unfilledSupported: Boolean)

  /** Structured Streaming liquidation accumulation (ST1): keyed by
    * (symbol, minute); emits an updated feature row per micro-batch.
    * Run with OutputMode.Update.
    *
    * `cleanupTimeout = true` evicts group state `timeoutDuration` (the
    * reference's 3-minute safety lag, `core/config.py:19`) after the
    * last event via ProcessingTimeTimeout. Note: a processing-time
    * timeout makes the stateful operator request a micro-batch on every
    * trigger even with no data (timeout sweep) — correct on a cluster,
    * but pass `false` where continuous empty batches are undesirable
    * (tests, ad hoc). `timeoutDuration` exists so the eviction soak can
    * compress hours of cadence into seconds of wall clock; production
    * keeps the default. */
  def liquidationMinuteFeaturesStream(events: Dataset[LiquidationEvent],
                                      unfilledSupported: Boolean = true,
                                      cleanupTimeout: Boolean = false,
                                      timeoutDuration: String = "3 minutes"): Dataset[LiqMinuteFeatures] = {
    implicit val outEnc = Encoders.product[LiqMinuteFeatures]
    implicit val stateEnc = Encoders.product[LiqState]

    def update(key: (String, Long), rows: Iterator[LiquidationEvent],
               state: GroupState[LiqState]): Iterator[LiqMinuteFeatures] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val acc = new MinuteAccumulator(unfilledSupported)
      state.getOption.foreach { s =>
        acc.liqLongVol = s.longVol; acc.liqShortVol = s.shortVol
        acc.liqLongCount = s.longCount; acc.liqShortCount = s.shortCount
        acc.liqQtyTotal = s.qtyTotal; acc.liqWeightedPriceSum = s.weightedPriceSum
        acc.liqEventCount = s.eventCount; acc.liqOrigQtyTotal = s.origQtyTotal
        acc.liqExecutedQtyTotal = s.executedQtyTotal
        acc.liqUnfilledSupported = s.unfilledSupported
      }
      rows.toSeq.sortBy(e => (e.eventTime, e.price, e.quantity))
        .foreach(acc.addLiquidation(_, unfilledSupported))
      state.update(LiqState(acc.liqLongVol, acc.liqShortVol, acc.liqLongCount,
        acc.liqShortCount, acc.liqQtyTotal, acc.liqWeightedPriceSum,
        acc.liqEventCount, acc.liqOrigQtyTotal, acc.liqExecutedQtyTotal,
        acc.liqUnfilledSupported))
      if (cleanupTimeout) state.setTimeoutDuration(timeoutDuration)
      Iterator.single(acc.liqFeatures(key._1, key._2, unfilledSupported))
    }

    val timeout =
      if (cleanupTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(e => (e.symbol, floorToMinuteMs(e.eventTime)))(
      Encoders.product[(String, Long)])
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(update)
  }

  /** Per-(consumer, minute) heartbeat upsert (ST7 — reference
    * `websocket.py:221-232,1325-1401`): every consumer marks itself
    * alive per minute; DQ uses staleness to decide coverage flags.
    * Keep-last-wins per key, like the reference's SQLite upsert. */
  final case class ConsumerHeartbeat(consumerName: String, minuteTimestampMs: Long,
                                     alive: Boolean, lastMessageTime: Option[Long])

  final class HeartbeatTracker {
    private val beats =
      scala.collection.mutable.Map[(String, Long), ConsumerHeartbeat]()
    def mark(consumer: String, minuteMs: Long, alive: Boolean = true,
             lastMessageTime: Option[Long] = None): Unit = synchronized {
      beats((consumer, floorToMinuteMs(minuteMs))) =
        ConsumerHeartbeat(consumer, floorToMinuteMs(minuteMs), alive, lastMessageTime)
    }
    def get(consumer: String, minuteMs: Long): Option[ConsumerHeartbeat] =
      synchronized(beats.get((consumer, floorToMinuteMs(minuteMs))))
    def all: Seq[ConsumerHeartbeat] = synchronized(beats.values.toSeq)
    /** Retention: drop heartbeats older than the cutoff (reference keeps
      * 14 days — `core/config.py:27`). */
    def evictBefore(cutoffMs: Long): Int = synchronized {
      val stale = beats.keys.filter(_._2 < cutoffMs).toSeq
      stale.foreach(beats.remove)
      stale.size
    }
  }

  /** Start a liquidation minute-features sink (S15, reference
    * `websocket.py:416-899`): update-mode rows land as a foreachBatch
    * UPSERT — each micro-batch appends parquet tagged with its batch id,
    * and [[readLiqFeatures]] resolves last-writer-wins per (symbol,
    * minute). Returns the STARTED query (callers stop/await it). */
  def startLiqFeatureSink(spark: SparkSession, events: Dataset[LiquidationEvent],
                          outDir: String, checkpointDir: String) = {
    import org.apache.spark.sql.functions.lit
    liquidationMinuteFeaturesStream(events)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[LiqMinuteFeatures], batchId: Long) =>
        batch.withColumn("__batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()
  }

  /** Read the liq-features sink with upsert semantics: last batch wins
    * per (symbol, minute). */
  def readLiqFeatures(spark: SparkSession, outDir: String) = {
    import org.apache.spark.sql.functions.col
    graft.ops.Ops.dedupKeepLast(
      spark.read.parquet(outDir),
      Seq("symbol", "timestampMs"), Seq(col("__batch_id")))
      .drop("__batch_id")
  }
}
