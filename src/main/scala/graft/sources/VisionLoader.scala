package graft.sources

import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vision daily-ZIP loader (S6/S7 — reference
  * `sources/vision_loader.py:28-312`): CSV-in-ZIP with tolerant schema
  * enforcement (missing columns become typed NULLs, extra columns are
  * dropped, values cast non-strictly), per-stream column renames, and an
  * epoch-ms window filter.
  *
  * Spark shape: ZIPs are read with the `binaryFile` source and unzipped
  * in a `mapPartitions`-style flatMap — the decompression runs on
  * executors, one task per file, so a backfill over thousands of daily
  * ZIPs parallelizes with the cluster (no driver-side extraction).
  * Download/caching (`.missing` markers, TTL) is driver-side client code
  * out of Spark's data plane, as in the reference.
  */
object VisionLoader {

  /** Declared CSV schemas per Vision stream (reference
    * `vision_loader.py:28-211`). */
  val klineCsvSchema: StructType = StructType(Seq(
    StructField("open_time", LongType), StructField("open", DoubleType),
    StructField("high", DoubleType), StructField("low", DoubleType),
    StructField("close", DoubleType), StructField("volume", DoubleType),
    StructField("close_time", LongType), StructField("quote_volume", DoubleType),
    StructField("count", LongType), StructField("taker_buy_volume", DoubleType),
    StructField("taker_buy_quote_volume", DoubleType), StructField("ignore", LongType)))

  val markIndexCsvSchema: StructType = StructType(Seq(
    StructField("open_time", LongType), StructField("open", DoubleType),
    StructField("high", DoubleType), StructField("low", DoubleType),
    StructField("close", DoubleType)))

  val metricsCsvSchema: StructType = StructType(Seq(
    StructField("create_time", StringType), StructField("symbol", StringType),
    StructField("sum_open_interest", DoubleType),
    StructField("sum_open_interest_value", DoubleType),
    StructField("count_toptrader_long_short_ratio", DoubleType),
    StructField("sum_toptrader_long_short_ratio", DoubleType),
    StructField("count_long_short_ratio", DoubleType),
    StructField("sum_taker_long_short_vol_ratio", DoubleType)))

  /** Read the first CSV of every ZIP under `zipGlob` into one DataFrame,
    * enforcing `schema` tolerantly. Executor-side unzip via binaryFile. */
  def readZipCsv(spark: SparkSession, zipGlob: String, schema: StructType,
                 hasHeader: Boolean = false): DataFrame = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile").load(zipGlob)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val zis = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
        var entry = zis.getNextEntry
        var out = List.empty[String]
        while (entry != null && out.isEmpty) {
          if (entry.getName.endsWith(".csv")) {
            val text = new String(zis.readAllBytes(), "UTF-8")
            out = text.split('\n').toList.filter(_.nonEmpty)
          }
          entry = zis.getNextEntry
        }
        if (hasHeader) out.drop(1) else out
      }
    enforceSchema(
      spark.read.schema(addTolerantPadding(schema))
        .option("mode", "PERMISSIVE").csv(lines.toDF("value").as[String]),
      schema)
  }

  /** CSV column count can exceed the declaration; pad the read schema so
    * PERMISSIVE mode keeps rows, then select/cast the declared columns. */
  private def addTolerantPadding(schema: StructType): StructType =
    StructType(schema.fields ++
      (0 until 4).map(i => StructField(s"__extra_$i", StringType)))

  /** Tolerant schema enforcement (reference `vision_loader.py:303-310`):
    * missing declared columns → typed NULL; extras dropped; non-strict
    * casts. */
  def enforceSchema(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    schema.fields.foldLeft(df) { (acc, f) =>
      if (present.contains(f.name)) acc.withColumn(f.name, col(f.name).cast(f.dataType))
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(schema.fieldNames.map(col): _*)
  }

  /** Epoch-ms window filter shared by all stream loaders (reference
    * `vision_loader.py:245-262`). */
  def filterWindow(df: DataFrame, tsColumn: String, startMs: Long, endMs: Long): DataFrame =
    df.where(col(tsColumn) >= startMs && col(tsColumn) <= endMs)

  /** klines stream loader: Vision CSV names → canonical record names
    * (reference `vision_loader.py:28-66`). */
  def klinesFromZips(spark: SparkSession, zipGlob: String,
                     startMs: Long, endMs: Long, hasHeader: Boolean = false): DataFrame =
    filterWindow(readZipCsv(spark, zipGlob, klineCsvSchema, hasHeader), "open_time", startMs, endMs)
      .select(col("open_time"), col("open"), col("high"), col("low"), col("close"),
        col("volume").as("volume_btc"), col("quote_volume").as("volume_usdt"),
        col("count").as("trade_count"),
        col("taker_buy_volume").as("taker_buy_vol_btc"),
        col("taker_buy_quote_volume").as("taker_buy_vol_usdt"))

  def markPriceKlinesFromZips(spark: SparkSession, zipGlob: String,
                              startMs: Long, endMs: Long, hasHeader: Boolean = false): DataFrame =
    filterWindow(readZipCsv(spark, zipGlob, markIndexCsvSchema, hasHeader), "open_time", startMs, endMs)
      .select(col("open_time"), col("open").as("mark_price_open"),
        col("high").as("mark_price_high"), col("low").as("mark_price_low"),
        col("close").as("mark_price_close"))

  def indexPriceKlinesFromZips(spark: SparkSession, zipGlob: String,
                               startMs: Long, endMs: Long, hasHeader: Boolean = false): DataFrame =
    filterWindow(readZipCsv(spark, zipGlob, markIndexCsvSchema, hasHeader), "open_time", startMs, endMs)
      .select(col("open_time"), col("open").as("index_price_open"),
        col("high").as("index_price_high"), col("low").as("index_price_low"),
        col("close").as("index_price_close"))

  /** metrics stream loader — string create_time; OI derived from
    * sums/counts downstream in MinuteBuilder.metricsFrame. */
  def metricsFromZips(spark: SparkSession, zipGlob: String, hasHeader: Boolean = true): DataFrame =
    readZipCsv(spark, zipGlob, metricsCsvSchema, hasHeader)

  val aggTradesCsvSchema: StructType = StructType(Seq(
    StructField("agg_trade_id", LongType), StructField("price", DoubleType),
    StructField("quantity", DoubleType), StructField("first_trade_id", LongType),
    StructField("last_trade_id", LongType), StructField("transact_time", LongType),
    StructField("is_buyer_maker", BooleanType)))

  /** aggTrades stream loader (reference `vision_loader.py:120-155`).
    * The reference coalesces header-name variants
    * (aggregate_trade_id/timestamp/was_buyer_maker); our reads are
    * positional against the declared daily layout, which is the same for
    * both namings, so the coalesce collapses to the rename below. */
  def aggTradesFromZips(spark: SparkSession, zipGlob: String,
                        startMs: Long, endMs: Long, hasHeader: Boolean = false): DataFrame =
    filterWindow(readZipCsv(spark, zipGlob, aggTradesCsvSchema, hasHeader),
      "transact_time", startMs, endMs)
      .select(col("agg_trade_id"), col("price"), col("quantity").as("qty"),
        col("first_trade_id"), col("last_trade_id"), col("transact_time"),
        col("is_buyer_maker"))

  val bookTickerCsvSchema: StructType = StructType(Seq(
    StructField("update_id", LongType), StructField("best_bid_price", DoubleType),
    StructField("best_bid_qty", DoubleType), StructField("best_ask_price", DoubleType),
    StructField("best_ask_qty", DoubleType), StructField("transaction_time", LongType),
    StructField("event_time", LongType)))

  /** Metrics-ZIP inspector (reference `sources/metrics_inspector.py`):
    * header row of the first CSV inside a daily ZIP — driver-side, used
    * to diagnose schema drift before a load. */
  def listZipCsvColumns(zipPath: String): Seq[String] = {
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val entries = zf.entries()
      var csv: Option[java.util.zip.ZipEntry] = None
      while (csv.isEmpty && entries.hasMoreElements) {
        val e = entries.nextElement()
        if (e.getName.endsWith(".csv")) csv = Some(e)
      }
      val entry = csv.getOrElse(
        throw new IllegalArgumentException(s"No CSV file found inside $zipPath"))
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(zf.getInputStream(entry), "UTF-8"))
      val header = Option(reader.readLine()).getOrElse(
        throw new IllegalArgumentException(s"CSV in $zipPath is empty"))
      header.split(",", -1).toSeq
    } finally zf.close()
  }

  /** bookTicker stream loader (reference `vision_loader.py:157-182`). */
  def bookTickerFromZips(spark: SparkSession, zipGlob: String,
                         startMs: Long, endMs: Long, hasHeader: Boolean = false): DataFrame =
    filterWindow(readZipCsv(spark, zipGlob, bookTickerCsvSchema, hasHeader),
      "event_time", startMs, endMs)
      .select(col("update_id"), col("best_bid_price").as("bid_price"),
        col("best_bid_qty").as("bid_qty"), col("best_ask_price").as("ask_price"),
        col("best_ask_qty").as("ask_qty"), col("transaction_time"), col("event_time"))

  /** Raw (non-aggregated) trades daily CSV layout — the public Binance
    * Vision `trades/{SYMBOL}/` stream (reference addendum §B1.1; the
    * reference's own loader set stops at aggTrades,
    * `vision_loader.py:28-211`, so this completes the addendum's
    * 9-stream table). */
  val tradesCsvSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("price", DoubleType),
    StructField("qty", DoubleType), StructField("quote_qty", DoubleType),
    StructField("time", LongType), StructField("is_buyer_maker", BooleanType)))

  /** trades stream loader: per-trade events, windowed on the trade
    * timestamp; downstream minute bucketing treats them exactly like
    * aggTrades (addendum §I: "Bucket by minute and aggregate"). */
  def tradesFromZips(spark: SparkSession, zipGlob: String,
                     startMs: Long, endMs: Long, hasHeader: Boolean = false): DataFrame =
    filterWindow(readZipCsv(spark, zipGlob, tradesCsvSchema, hasHeader),
      "time", startMs, endMs)
      .select(col("id").as("trade_id"), col("price"), col("qty"),
        col("quote_qty"), col("time").as("transact_time"), col("is_buyer_maker"))

  /** bookDepth daily CSV layout — the public Binance Vision
    * `bookDepth/{SYMBOL}/` stream: per-snapshot depth at fixed
    * percentage offsets from mid (±1..±5%), with a DATETIME-string
    * timestamp (`yyyy-MM-dd HH:mm:ss`, UTC), unlike the epoch-ms
    * streams. */
  val bookDepthCsvSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType), StructField("percentage", LongType),
    StructField("depth", DoubleType), StructField("notional", DoubleType)))

  /** bookDepth stream loader: parses the datetime-string timestamp to
    * epoch ms (`snapshot_time`) so the shared window filter applies;
    * addendum §I normalizes these snapshots per minute downstream
    * (last-in-minute / mean). Daily bookDepth files carry a header row,
    * hence the `hasHeader = true` default (like metrics). */
  def bookDepthFromZips(spark: SparkSession, zipGlob: String,
                        startMs: Long, endMs: Long, hasHeader: Boolean = true): DataFrame =
    filterWindow(
      readZipCsv(spark, zipGlob, bookDepthCsvSchema, hasHeader)
        .withColumn("snapshot_time",
          unix_millis(to_timestamp(col("timestamp"), "yyyy-MM-dd HH:mm:ss"))),
      "snapshot_time", startMs, endMs)
      .select(col("snapshot_time"), col("percentage"), col("depth"), col("notional"))
}
