package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{HtfAggregator, MinuteBuilder}
import graft.schema.Timeframes

/** Golden values ported from reference `tests/test_aggregator.py:260-366`. */
class HtfAggregatorSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal canonical-minute frame builder for fixtures: a kline-only
    * canonical frame whose analytics columns can be overridden. */
  private def minuteFrame(rows: Seq[(String, Map[String, Any])]): DataFrame = {
    val base = rows.map { case (t, over) =>
      (ts(t),
        over.getOrElse("open", 100.0).asInstanceOf[Double],
        over.getOrElse("high", 101.0).asInstanceOf[Double],
        over.getOrElse("low", 99.0).asInstanceOf[Double],
        over.getOrElse("close", 100.5).asInstanceOf[Double],
        over.getOrElse("volume_btc", 1.0).asInstanceOf[Double],
        over.getOrElse("volume_usdt", 100000.0).asInstanceOf[Double],
        over.get("avg_spread_usdt").map(_.asInstanceOf[Double]),
        over.get("price_impact_100k").map(_.asInstanceOf[Double]),
        over.get("oi_contracts").map(_.asInstanceOf[Double]),
        over.get("funding_rate").map(_.asInstanceOf[Double]))
    }.toDF("timestamp", "open", "high", "low", "close", "volume_btc",
      "volume_usdt", "avg_spread_usdt", "price_impact_100k", "oi_contracts",
      "funding_rate")
    // widen to the full canonical schema with nulls/defaults
    MinuteBuilder.finalizeSchema(base
      .withColumn("trade_count", lit(10L))
      .withColumn("taker_buy_vol_btc", lit(0.5))
      .withColumn("taker_buy_vol_usdt", lit(50000.0))
      .withColumn("mark_price_open", lit(100.0))
      .withColumn("mark_price_close", lit(100.5))
      .withColumn("index_price_open", lit(100.0))
      .withColumn("index_price_close", lit(100.4)))
  }

  private def m(t: String, over: (String, Any)*): (String, Map[String, Any]) =
    (t, over.toMap)

  test("OHLC correctness (test_aggregator.py:272-290)") {
    val frame = minuteFrame(Seq(
      m("2026-01-01T00:00:00Z", "open" -> 100.0, "high" -> 101.0, "low" -> 99.0, "close" -> 100.5),
      m("2026-01-01T00:01:00Z", "open" -> 101.0, "high" -> 105.0, "low" -> 100.0, "close" -> 104.0),
      m("2026-01-01T00:02:00Z", "open" -> 104.0, "high" -> 104.5, "low" -> 95.0, "close" -> 96.0),
      m("2026-01-01T00:03:00Z", "open" -> 96.0, "high" -> 97.0, "low" -> 94.0, "close" -> 95.0),
      m("2026-01-01T00:04:00Z", "open" -> 95.0, "high" -> 96.0, "low" -> 93.0, "close" -> 94.5)))
    val r = HtfAggregator.aggregateMinutes(frame, Timeframes.parse("5m"), "BTCUSDT").collect().head
    val cols = HtfAggregator.targetColumns
    def v(c: String): Any = r.get(cols.indexOf(c))
    assert(v("open") == 100.0 && v("high") == 105.0 && v("low") == 93.0 && v("close") == 94.5)
    assert(v("bucket_complete") == true && v("observed_minutes_in_bucket") == 5L)
    assert(v("timeframe") == "5m" && v("symbol") == "BTCUSDT")
  }

  test("multi-symbol aggregation in ONE job matches per-symbol runs (byCols)") {
    val aMinutes = Seq(
      m("2026-01-01T00:00:00Z", "open" -> 100.0, "close" -> 104.0),
      m("2026-01-01T00:01:00Z", "open" -> 104.0, "close" -> 99.0, "low" -> 95.0),
      m("2026-01-01T00:02:00Z"), m("2026-01-01T00:03:00Z"), m("2026-01-01T00:04:00Z"))
    val bMinutes = Seq(
      m("2026-01-01T00:00:00Z", "open" -> 500.0, "close" -> 510.0, "high" -> 512.0),
      m("2026-01-01T00:01:00Z"), m("2026-01-01T00:02:00Z"),
      m("2026-01-01T00:03:00Z"), m("2026-01-01T00:04:00Z"))
    val combined = minuteFrame(aMinutes).withColumn("symbol", lit("AAA"))
      .unionByName(minuteFrame(bMinutes).withColumn("symbol", lit("BBB")))
    // ONE aggregation keyed by (symbol, bucket) — the 1000-symbol plan
    val multi = HtfAggregator.aggregateMinutes(combined, Timeframes.parse("5m"),
      symbol = "", byCols = Seq("symbol"))
    val cols = multi.columns
    def row(df: org.apache.spark.sql.DataFrame, sym: String) =
      df.where(col("symbol") === sym).collect().head
    val perA = HtfAggregator.aggregateMinutes(minuteFrame(aMinutes),
      Timeframes.parse("5m"), "AAA").collect().head
    val perB = HtfAggregator.aggregateMinutes(minuteFrame(bMinutes),
      Timeframes.parse("5m"), "BBB").collect().head
    for (c <- Seq("open", "high", "low", "close", "volume_btc", "vwap",
                  "observed_minutes_in_bucket", "bucket_complete")) {
      assert(row(multi, "AAA").get(cols.indexOf(c)) ==
        perA.get(HtfAggregator.targetColumns.indexOf(c)), s"AAA col $c")
      assert(row(multi, "BBB").get(cols.indexOf(c)) ==
        perB.get(HtfAggregator.targetColumns.indexOf(c)), s"BBB col $c")
    }
    // no cross-symbol bleed: distinct buckets, per-symbol OHLC
    assert(multi.count() == 2)
    assert(row(multi, "AAA").get(cols.indexOf("high")) != 512.0)
  }

  test("volume-weighted average with simple-mean fallback (test_aggregator.py:292-308)") {
    val frame = minuteFrame(Seq(
      m("2026-01-01T00:00:00Z", "volume_usdt" -> 100.0, "avg_spread_usdt" -> 1.0, "price_impact_100k" -> 2.0),
      m("2026-01-01T00:01:00Z", "volume_usdt" -> 300.0, "avg_spread_usdt" -> 3.0, "price_impact_100k" -> 4.0),
      m("2026-01-01T00:02:00Z", "volume_usdt" -> 0.0, "avg_spread_usdt" -> 100.0, "price_impact_100k" -> 100.0),
      m("2026-01-01T00:03:00Z", "volume_usdt" -> 0.0, "avg_spread_usdt" -> 100.0, "price_impact_100k" -> 100.0),
      m("2026-01-01T00:04:00Z", "volume_usdt" -> 0.0, "avg_spread_usdt" -> 100.0, "price_impact_100k" -> 100.0)))
    val r = HtfAggregator.aggregateMinutes(frame, Timeframes.parse("5m"), "BTCUSDT").collect().head
    val cols = HtfAggregator.targetColumns
    // weight>0 rows dominate: (1*100 + 3*300) / 400 = 2.5 ; (2*100+4*300)/400 = 3.5
    assert(r.get(cols.indexOf("avg_spread_usdt")) == 2.5)
    assert(r.get(cols.indexOf("price_impact_100k")) == 3.5)
  }

  test("snapshot last-non-null (test_aggregator.py:310-326)") {
    val frame = minuteFrame(Seq(
      m("2026-01-01T00:00:00Z"),
      m("2026-01-01T00:01:00Z", "oi_contracts" -> 1000.0, "funding_rate" -> 0.001),
      m("2026-01-01T00:02:00Z"),
      m("2026-01-01T00:03:00Z", "oi_contracts" -> 1100.0, "funding_rate" -> 0.002),
      m("2026-01-01T00:04:00Z")))
    val r = HtfAggregator.aggregateMinutes(frame, Timeframes.parse("5m"), "BTCUSDT").collect().head
    val cols = HtfAggregator.targetColumns
    assert(r.get(cols.indexOf("oi_contracts")) == 1100.0)
    assert(r.get(cols.indexOf("funding_rate")) == 0.002)
  }

  test("weekly Monday / monthly day-1 bucket boundaries (test_aggregator.py:328-350)") {
    val weekFrame = minuteFrame(Seq(
      m("2026-01-04T23:59:00Z", "close" -> 100.0),
      m("2026-01-05T00:00:00Z", "close" -> 101.0)))
    val weekly = HtfAggregator.aggregateMinutes(weekFrame, Timeframes.parse("1w"), "BTCUSDT")
      .select("bucket_start").collect().map(_.getTimestamp(0).toInstant).toSeq
    assert(weekly == Seq(instant("2025-12-29T00:00:00Z"), instant("2026-01-05T00:00:00Z")))

    val monthFrame = minuteFrame(Seq(
      m("2026-01-31T23:59:00Z", "close" -> 200.0),
      m("2026-02-01T00:00:00Z", "close" -> 201.0)))
    val monthly = HtfAggregator.aggregateMinutes(monthFrame, Timeframes.parse("1M"), "BTCUSDT")
      .select("bucket_start", "bucket_end", "expected_minutes_in_bucket")
      .collect().map(r => (r.getTimestamp(0).toInstant, r.getTimestamp(1).toInstant, r.getLong(2))).toSeq
    assert(monthly == Seq(
      (instant("2026-01-01T00:00:00Z"), instant("2026-02-01T00:00:00Z"), 31L * 1440),
      (instant("2026-02-01T00:00:00Z"), instant("2026-03-01T00:00:00Z"), 28L * 1440)))
  }

  test("incomplete buckets are flagged and filterable (test_aggregator.py:352-366)") {
    val frame = minuteFrame((0 until 4).map(i =>
      m(f"2026-01-01T00:0$i:00Z")))
    val out = HtfAggregator.aggregateMinutes(frame, Timeframes.parse("5m"), "BTCUSDT")
    val r = out.collect().head
    val cols = HtfAggregator.targetColumns
    assert(r.get(cols.indexOf("bucket_complete")) == false)
    assert(r.get(cols.indexOf("missing_minutes_count")) == 1L)
    assert(out.where(col("bucket_complete")).count() == 0)
  }

  test("realized_vol_htf from in-bucket close-to-close log returns") {
    val frame = minuteFrame(Seq(
      m("2026-01-01T00:00:00Z", "close" -> 100.0),
      m("2026-01-01T00:01:00Z", "close" -> 102.0),
      m("2026-01-01T00:02:00Z", "close" -> 101.0),
      m("2026-01-01T00:03:00Z", "close" -> 101.0),
      m("2026-01-01T00:04:00Z", "close" -> 103.0)))
    val r = HtfAggregator.aggregateMinutes(frame, Timeframes.parse("5m"), "BTCUSDT").collect().head
    val expected = math.sqrt(
      math.pow(math.log(102.0 / 100.0), 2) + math.pow(math.log(101.0 / 102.0), 2) +
        math.pow(math.log(101.0 / 101.0), 2) + math.pow(math.log(103.0 / 101.0), 2))
    val got = r.get(HtfAggregator.targetColumns.indexOf("realized_vol_htf")).asInstanceOf[Double]
    assert(math.abs(got - expected) < 1e-12)
  }

  test("missing-bucket detection via anti join (validator.py:17-52)") {
    val frame = minuteFrame((0 until 10).map(i => m(f"2026-01-01T00:0$i:00Z")))
    val existing = Seq(Tuple1(ts("2026-01-01T00:00:00Z"))).toDF("bucket_start")
    val missing = HtfAggregator.missingCompleteBuckets(frame, Timeframes.parse("5m"), existing)
      .collect().map(_.getTimestamp(0).toInstant).toSeq
    assert(missing == Seq(instant("2026-01-01T00:05:00Z")))
  }
}
