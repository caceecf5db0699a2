package graft

import org.apache.spark.sql.functions._

import graft.operators.{Indicators, MinuteBuilder, QueryAggregator}
import graft.schema.Timeframes

class QueryAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def canonicalMinutes(n: Int, startIso: String = "2026-01-15T10:00:00Z") = {
    val start = instant(startIso)
    val rows = (0 until n).map { i =>
      (java.sql.Timestamp.from(start.plusSeconds(60L * i)),
        100.0 + i, 101.0 + i, 99.0 + i, 100.5 + i, 1.0, 100000.0,
        if (i % 2 == 0) 0.5 else -0.5) // net_taker_vol_btc alternates
    }.toDF("timestamp", "open", "high", "low", "close", "volume_btc",
      "volume_usdt", "net_taker_vol_btc")
    MinuteBuilder.finalizeSchema(rows
      .withColumn("trade_count", lit(10L))
      .withColumn("vwap_1m", col("close"))
      .withColumn("taker_buy_vol_btc", lit(0.5))
      .withColumn("taker_buy_vol_usdt", lit(50000.0))
      .withColumn("mark_price_open", lit(100.0))
      .withColumn("mark_price_close", lit(100.5))
      .withColumn("index_price_open", lit(100.0))
      .withColumn("index_price_close", lit(100.4)))
  }

  test("incomplete trailing window is dropped; complete windows aggregate (aggregation.py:114)") {
    // 12 minutes → two complete 5m windows + 2 dangling minutes
    val out = QueryAggregator.aggregateCanonicalFrame(
      canonicalMinutes(12), Timeframes.parse("5m"), limit = 200)
    val rows = out.select("timestamp", "open", "close", "volume_btc").orderBy("timestamp").collect()
    assert(rows.length == 2)
    assert(rows(0).getTimestamp(0).toInstant == instant("2026-01-15T10:00:00Z"))
    assert(rows(0).getDouble(1) == 100.0) // first open
    assert(rows(0).getDouble(2) == 104.5) // last close of window
    assert(rows(0).getDouble(3) == 5.0)   // summed volume
  }

  test("tail(limit) keeps the trailing bars in ascending order (aggregation.py:171)") {
    val out = QueryAggregator.aggregateCanonicalFrame(
      canonicalMinutes(30), Timeframes.parse("5m"), limit = 2)
    val tss = out.select("timestamp").collect().map(_.getTimestamp(0).toInstant).toSeq
    assert(tss == Seq(instant("2026-01-15T10:20:00Z"), instant("2026-01-15T10:25:00Z")))
  }

  test("CVD is the running sum of net taker volume across the window (aggregation.py:222-227)") {
    val out = QueryAggregator.aggregateCanonicalFrame(
      canonicalMinutes(15), Timeframes.parse("5m"), limit = 200)
    // bar nets alternate: minutes 0-4 → +0.5, 5-9 → -0.5, 10-14 → +0.5
    val got = out.orderBy("timestamp").select("cvd_btc").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.5, 0.0, 0.5))
  }

  test("multi-symbol frames aggregate per symbol with no unpartitioned window") {
    val two = canonicalMinutes(12).withColumn("symbol", lit("AAA"))
      .unionByName(canonicalMinutes(12).withColumn("symbol", lit("BBB"))
        .withColumn("close", col("close") + 1000.0))
    val out = QueryAggregator.aggregateCanonicalFrame(
      two, Timeframes.parse("5m"), limit = 1, partitionCols = Seq("symbol"))
    // every logical Window must carry a partition spec — an empty one
    // would funnel the whole frame through a single task at scale
    val unpartitioned = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, "found unpartitioned window in plan")
    val rows = out.select("symbol", "timestamp", "close").collect()
    // per-symbol tail(1): one bar each, the 10:05 window
    assert(rows.length == 2)
    assert(rows.forall(_.getTimestamp(1).toInstant == instant("2026-01-15T10:05:00Z")))
    val bySym = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(bySym("AAA") == 109.5 && bySym("BBB") == 1109.5)
    // delta fields must also partition by symbol (no cross-series lag)
    val withDeltas = QueryAggregator.addDeltaFields(
      QueryAggregator.aggregateCanonicalFrame(
        two, Timeframes.parse("5m"), limit = 200, partitionCols = Seq("symbol")),
      partitionCols = Seq("symbol"))
    val firstBars = withDeltas.where(col("timestamp") === ts("2026-01-15T10:00:00Z"))
      .select("realized_vol_bar").collect()
    assert(firstBars.length == 2 && firstBars.forall(_.isNullAt(0)))
  }

  test("latency p95 is exact nearest-rank, not interpolating (websocket.py:100-105)") {
    // samples 1..5 in one 5m bucket: nearest-rank p95 takes rank
    // ceil(0.95*5)=5 → 5.0; interpolating percentile would give 4.8
    val base = canonicalMinutes(10)
    val lat = base.withColumn("latency_engine",
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("timestamp"))).cast("long"))
    val out = QueryAggregator.aggregateCanonicalFrame(
      MinuteBuilder.finalizeSchema(lat), Timeframes.parse("5m"), limit = 10)
    assert(out.orderBy("timestamp").select("latency_engine")
      .collect().map(_.getLong(0)).toSeq == Seq(5L, 10L))
    // all-null group → NULL, not an ANSI element_at error
    val out2 = QueryAggregator.aggregateCanonicalFrame(
      canonicalMinutes(10), Timeframes.parse("5m"), limit = 10)
    assert(out2.select("latency_engine").collect().forall(_.isNullAt(0)))
  }

  test("delta fields lag by one bar and are NULL on the first (service.py:1218-1257)") {
    val agg = QueryAggregator.aggregateCanonicalFrame(
      canonicalMinutes(15), Timeframes.parse("5m"), limit = 200)
    val out = QueryAggregator.addDeltaFields(agg).orderBy("timestamp")
      .select("delta_oi_contracts", "realized_vol_bar").collect()
    assert(out(0).isNullAt(1)) // first bar has no previous close
    assert(!out(1).isNullAt(1))
  }

  test("indicator OHLC bars: non-null gates + end-exclusive bound (live_indicators/aggregation.py:22-75)") {
    val start = instant("2026-01-15T00:00:00Z")
    val rows: Seq[(java.sql.Timestamp, Option[Double], Option[Double], Option[Double], Option[Double])] =
      (0 until 10).map { i =>
        if (i == 0 || i == 3)
          (java.sql.Timestamp.from(start.plusSeconds(60L * i)), None, None, None, None)
        else
          (java.sql.Timestamp.from(start.plusSeconds(60L * i)),
            Some(100.0 + i), Some(101.0 + i), Some(99.0 + i), Some(100.5 + i))
      }
    val df = rows.toDF("timestamp", "open", "high", "low", "close")
    val out = graft.operators.Indicators.aggregateOhlcBars(df,
      graft.schema.Timeframes.parse("5m"), instant("2026-01-15T00:09:00Z"))
      .collect()
    // both 5m windows are minute-complete; first window's open comes from
    // the first NON-NULL minute (i=1)
    assert(out.length == 2)
    assert(out(0).getDouble(1) == 101.0) // open skips the null minute 0
    assert(out(0).getDouble(4) == 104.5) // close from minute 4
    // end bound: end_time mid-window drops the second bar
    val bounded = graft.operators.Indicators.aggregateOhlcBars(df,
      graft.schema.Timeframes.parse("5m"), instant("2026-01-15T00:07:00Z"))
      .collect()
    assert(bounded.length == 1)
  }

  test("heartbeat tracker upserts per (consumer, minute) and evicts stale (websocket.py:1325-1401)") {
    import graft.streaming.LiveCollector.HeartbeatTracker
    val hb = new HeartbeatTracker
    val m = ms("2026-01-15T10:00:30Z") // mid-minute → floored
    hb.mark("liquidation", m, alive = true, Some(m + 5))
    hb.mark("liquidation", m, alive = true, Some(m + 9)) // upsert same key
    assert(hb.all.size == 1)
    assert(hb.get("liquidation", m).flatMap(_.lastMessageTime).contains(m + 9))
    hb.mark("depth", m + 60000)
    assert(hb.evictBefore(ms("2026-01-15T10:01:00Z")) == 1)
    assert(hb.all.map(_.consumerName) == Seq("depth"))
  }

  test("TradingView EMA uses SMA seed (test_live_indicators.py:69-72)") {
    val bars = Seq(
      (ts("2026-01-01T00:00:00Z"), 1.0), (ts("2026-01-01T00:01:00Z"), 2.0),
      (ts("2026-01-01T00:02:00Z"), 3.0), (ts("2026-01-01T00:03:00Z"), 4.0),
      (ts("2026-01-01T00:04:00Z"), 5.0)).toDF("timestamp", "close")
    val out = Indicators.withEma(bars, "close", 3).orderBy("timestamp")
      .select("ema").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, None, Some(2.0), Some(3.0), Some(4.0)))
  }

  test("EMA shorter than length is all NULL") {
    val bars = Seq((ts("2026-01-01T00:00:00Z"), 1.0), (ts("2026-01-01T00:01:00Z"), 2.0))
      .toDF("timestamp", "close")
    val out = Indicators.withEma(bars, "close", 3).select("ema").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("traditional pivots (pivots.py:4-12)") {
    val df = Seq((101.0, 99.0, 100.5)).toDF("h", "l", "c")
    val exprs = Indicators.pivotPoints(col("h"), col("l"), col("c"))
      .map { case (n, e) => e.as(n) }
    val r = df.select(exprs: _*).collect().head
    val p = (101.0 + 99.0 + 100.5) / 3.0
    assert(r.getDouble(0) == p)
    assert(r.getDouble(1) == 2 * p - 99.0)  // r1
    assert(r.getDouble(2) == p + 2.0)       // r2 = p + (h-l)
    assert(r.getDouble(3) == 2 * p - 101.0) // s1
    assert(r.getDouble(4) == p - 2.0)       // s2
  }
}
