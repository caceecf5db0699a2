package graft

import java.time.Instant

import graft.schema.{CanonicalSchema, SupportClass, Timeframes}

/** Mirrors reference `tests/test_schema_registry.py` and the
  * bucketing/timeframe boundary assertions of `tests/test_aggregator.py`. */
class SchemaAndTimeframesSpec extends SparkSpec {

  test("canonical schema has exactly 66 columns") {
    assert(CanonicalSchema.columns.size == 66)
    assert(CanonicalSchema.structType.fields.length == 66)
  }

  test("OHLC + timestamp are HARD_REQUIRED and non-nullable") {
    val hard = CanonicalSchema.hardRequired.toSet
    for (c <- Seq("timestamp", "open", "high", "low", "close", "volume_btc",
                  "volume_usdt", "trade_count", "mark_price_open",
                  "mark_price_close", "index_price_open", "index_price_close"))
      assert(hard.contains(c), s"$c should be HARD_REQUIRED")
    assert(!CanonicalSchema.structType("open").nullable)
    assert(CanonicalSchema.structType("vwap_1m").nullable)
  }

  test("all four support classes are present; schema hash is stable") {
    val classes = CanonicalSchema.columns.map(_.supportClass).toSet
    assert(classes.contains(SupportClass.HardRequired))
    assert(classes.contains(SupportClass.BackfillAvailable))
    assert(classes.contains(SupportClass.LiveOnly))
    assert(CanonicalSchema.schemaHash.length == 64)
    assert(CanonicalSchema.schemaHash == CanonicalSchema.schemaHash)
  }

  test("timeframe parsing with aliases") {
    assert(Timeframes.parse("1hr").name == "1h")
    assert(Timeframes.parse("1mo").name == "1M")
    assert(Timeframes.parse("15m").name == "15m")
    assertThrows[IllegalArgumentException](Timeframes.parse("2m"))
    assert(Timeframes.supportedNames.size == 12)
  }

  test("floor: 3m / 4h / 1d boundaries") {
    val tf3m = Timeframes.parse("3m")
    assert(tf3m.floorInstant(Instant.parse("2026-01-15T10:07:30Z")) ==
      Instant.parse("2026-01-15T10:06:00Z"))
    val tf4h = Timeframes.parse("4h")
    assert(tf4h.floorInstant(Instant.parse("2026-01-15T13:07:00Z")) ==
      Instant.parse("2026-01-15T12:00:00Z"))
    val tf1d = Timeframes.parse("1d")
    assert(tf1d.floorInstant(Instant.parse("2026-01-15T13:07:00Z")) ==
      Instant.parse("2026-01-15T00:00:00Z"))
  }

  test("week floors to Monday 00:00, month to day 1 (reference test_aggregator.py:328-350)") {
    val tf1w = Timeframes.parse("1w")
    // 2026-01-04 is a Sunday → week start Monday 2025-12-29
    assert(tf1w.floorInstant(Instant.parse("2026-01-04T23:59:00Z")) ==
      Instant.parse("2025-12-29T00:00:00Z"))
    assert(tf1w.floorInstant(Instant.parse("2026-01-05T00:00:00Z")) ==
      Instant.parse("2026-01-05T00:00:00Z"))
    val tf1M = Timeframes.parse("1M")
    assert(tf1M.floorInstant(Instant.parse("2026-01-31T23:59:00Z")) ==
      Instant.parse("2026-01-01T00:00:00Z"))
    assert(tf1M.floorInstant(Instant.parse("2026-02-01T00:00:00Z")) ==
      Instant.parse("2026-02-01T00:00:00Z"))
  }

  test("expression-level bucketStart matches the driver-side floor") {
    import org.apache.spark.sql.functions._
    val samples = Seq("2026-01-04T23:59:00Z", "2026-01-05T00:00:00Z",
      "2026-01-15T10:07:00Z", "2026-02-01T00:00:00Z", "2026-03-31T23:59:00Z")
    val df = spark.createDataFrame(
      samples.map(s => Tuple1(ts(s)))).toDF("timestamp")
    for (name <- Timeframes.supportedNames) {
      val tf = Timeframes.parse(name)
      val got = df.select(col("timestamp"), tf.bucketStart(col("timestamp")).as("b"))
        .collect().map(r => (r.getTimestamp(0).toInstant, r.getTimestamp(1).toInstant))
      for ((t, b) <- got)
        assert(b == tf.floorInstant(t), s"$name bucketStart($t)")
    }
  }

  test("addBuckets month arithmetic and latestCompleteBucketStart") {
    val tf1M = Timeframes.parse("1M")
    assert(tf1M.addBuckets(Instant.parse("2026-01-15T10:00:00Z")) ==
      Instant.parse("2026-02-01T00:00:00Z"))
    assert(tf1M.addBuckets(Instant.parse("2026-01-15T10:00:00Z"), -1) ==
      Instant.parse("2025-12-01T00:00:00Z"))
    val tf5m = Timeframes.parse("5m")
    // last source minute 10:04 completes the 10:00 bucket
    assert(tf5m.latestCompleteBucketStart(Instant.parse("2026-01-15T10:04:00Z"))
      .contains(Instant.parse("2026-01-15T10:00:00Z")))
    // 10:03 does not → previous bucket
    assert(tf5m.latestCompleteBucketStart(Instant.parse("2026-01-15T10:03:00Z"))
      .contains(Instant.parse("2026-01-15T09:55:00Z")))
  }

  test("expectedMinutes handles calendar months") {
    import org.apache.spark.sql.functions._
    val tf = Timeframes.parse("1M")
    val df = spark.createDataFrame(Seq(
      Tuple1(ts("2026-01-01T00:00:00Z")), Tuple1(ts("2026-02-01T00:00:00Z"))
    )).toDF("bucket_start")
    val got = df.select(tf.expectedMinutes(col("bucket_start")).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(31L * 1440, 28L * 1440))
  }
}
