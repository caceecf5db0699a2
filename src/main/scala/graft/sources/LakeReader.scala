package graft.sources

import java.time.Instant

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ops
import graft.schema.CanonicalSchema

/** Minute-lake reader (reference `aggregator/source_reader.py:13-78`,
  * `live_data_api_service/repository.py:22-52`).
  *
  * The reference builds explicit partition paths by hand; here a plain
  * `spark.read.parquet(root)` plus partition-column predicates lets
  * Catalyst prune `symbol=/year=/month=/day=/hour=` directories — the
  * same I/O, no path math (SURVEY §4). Timestamp predicates additionally
  * push into parquet row-group statistics.
  */
/** HTF-lake reader (S4's higher-timeframe half — reference
  * `live_data_api_service/repository.py:79-122`): bucket-window read
  * with the complete-bucket filter and latest-wins dedup, bucket_start
  * re-keyed as `timestamp` so downstream consumes HTF bars and 1m bars
  * through the same column. Partition pruning comes from the Hive
  * layout + timestamp predicates (no manual path math). */
class HtfLakeReader(root: String) {

  private def dir(timeframe: String, symbol: String) =
    s"$root/timeframe=$timeframe/symbol=${symbol.toUpperCase}"

  def readWindow(spark: SparkSession, timeframe: String, symbol: String,
                 start: Instant, end: Instant,
                 completeOnly: Boolean = true): Option[DataFrame] = {
    val d = dir(timeframe, symbol)
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new HPath(d))) return None
    var df = spark.read.parquet(d)
      .where(col("bucket_start").between(
        java.sql.Timestamp.from(start), java.sql.Timestamp.from(end)))
    if (completeOnly) df = df.where(col("bucket_complete"))
    // duplicate bucket rows should not exist, but if a repair ever
    // leaves one, prefer the complete / most-observed row deterministically
    Some(Ops.dedupKeepLast(df, Seq("bucket_start"),
        Seq(col("bucket_complete"), col("observed_minutes_in_bucket")))
      .drop("year", "month", "day")
      .withColumnRenamed("bucket_start", "timestamp"))
  }
}

class MinuteLakeReader(root: String) {

  private def lakeDir = s"$root/futures/um/minute"

  private def hasData(spark: SparkSession): Boolean = {
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.exists(new HPath(lakeDir))
  }

  /** Single-symbol scan, scoped to the symbol's OWN directory subtree.
    * Reading the lake root and filtering `symbol === X` prunes the
    * PARTITIONS correctly, but file LISTING happens before pruning —
    * Spark's file index enumerates every symbol's directories, so
    * request latency grows with lake WIDTH (measured: ×2.7 from 10 to
    * 1000 symbols at constant per-symbol data, `ServiceScaleProbe`).
    * Scoping the read to `symbol=X/` bounds the listing to one
    * symbol's tree — the per-request cost a 1000-symbol lake needs
    * (the reference gets this from its hand-built partition paths;
    * year/month/day/hour discovery still happens under the subtree). */
  def scanSymbol(spark: SparkSession, symbol: String): DataFrame = {
    val symbolDir = s"$lakeDir/symbol=${symbol.toUpperCase}"
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new HPath(symbolDir)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        CanonicalSchema.structType)
    else
      spark.read.parquet(symbolDir).drop("year", "month", "day", "hour")
  }

  /** Whole-lake scan keeping the `symbol` partition column — the input
    * to all-symbols-in-one-job processing (1000-symbol plans never loop
    * the driver over symbols). */
  def scanAllSymbols(spark: SparkSession): Option[DataFrame] =
    if (!hasData(spark)) None
    else Some(spark.read.parquet(lakeDir).drop("year", "month", "day", "hour"))

  /** Whole-lake windowed read with per-(symbol, minute) latest-wins
    * dedup — the multi-symbol form of [[readWindow]]. The window is
    * pushed into the PARTITION columns (lpad-normalized hour key, so
    * int- or string-inferred partition values both compare correctly):
    * a 2-hour repair window over a years-deep 1000-symbol lake must
    * prune to the touched hour directories, not scan-and-filter the
    * whole lake on a data column. */
  def readWindowAllSymbols(spark: SparkSession, start: Instant,
                           end: Instant): Option[DataFrame] = {
    if (!hasData(spark)) return None
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHH")
      .withZone(java.time.ZoneOffset.UTC)
    val hourKey = concat(
      lpad(col("year").cast("string"), 4, "0"),
      lpad(col("month").cast("string"), 2, "0"),
      lpad(col("day").cast("string"), 2, "0"),
      lpad(col("hour").cast("string"), 2, "0"))
    val df = spark.read.parquet(lakeDir)
      .where(hourKey.between(fmt.format(start), fmt.format(end)))
      .drop("year", "month", "day", "hour")
    Some(Ops.dedupKeepLast(
      df.where(col("timestamp").between(
        java.sql.Timestamp.from(start), java.sql.Timestamp.from(end))),
      Seq("symbol", "timestamp"),
      Seq(col("arrival_time"), col("event_time"), col("transact_time"),
        col("update_id_end"))))
  }

  /** Per-symbol latest minute for EVERY symbol via partition-directory
    * descent: walk each symbol's max year → month → day → hour by
    * directory LISTING (metadata only), then read just those max-hour
    * directories in one job. The steady-state incremental tick needs
    * per-symbol latest every cadence — computing it from a full-lake
    * scan reads the whole history per tick; this form reads one hour
    * partition per symbol regardless of lake depth. */
  def latestMinuteAllSymbols(spark: SparkSession): Map[String, Instant] = {
    if (!hasData(spark)) return Map.empty
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    // maxBy the PARSED numeric value after '=': lexicographic compare is
    // only correct on zero-padded names (our writer pads, but a lake with
    // int-inferred dirs has 'month=9' > 'month=12' and the descent would
    // silently return a stale "latest"). Non-numeric values fall back to
    // string order.
    def maxChild(p: HPath): Option[HPath] = {
      val kids = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.contains("="))
      if (kids.isEmpty) None
      else Some(kids.maxBy { k =>
        val v = k.getName.substring(k.getName.indexOf('=') + 1)
        v.toLongOption match {
          case Some(n) => (1, n, "")
          case None    => (0, 0L, v)
        }
      })
    }
    val hourDirs = fs.listStatus(new HPath(lakeDir)).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("symbol="))
      .flatMap(sd => maxChild(sd).flatMap(maxChild).flatMap(maxChild).flatMap(maxChild))
      .map(_.toString)
    if (hourDirs.isEmpty) return Map.empty
    spark.read.option("basePath", lakeDir).parquet(hourDirs.toIndexedSeq: _*)
      .groupBy("symbol").agg(max("timestamp").as("latest"))
      .collect().map(r => r.getString(0) -> r.getTimestamp(1).toInstant).toMap
  }

  /** min/max timestamp — parquet footer statistics make this a
    * metadata-only scan (S2). */
  def inspectRange(spark: SparkSession, symbol: String): (Option[Instant], Option[Instant]) = {
    val r = scanSymbol(spark, symbol)
      .agg(min(col("timestamp")).as("mn"), max(col("timestamp")).as("mx"))
      .collect().head
    (Option(r.getTimestamp(0)).map(_.toInstant), Option(r.getTimestamp(1)).map(_.toInstant))
  }

  def latestMinute(spark: SparkSession, symbol: String): Option[Instant] =
    inspectRange(spark, symbol)._2

  def scanAvailableMinutes(spark: SparkSession, symbol: String,
                           start: Option[Instant] = None,
                           end: Option[Instant] = None): DataFrame = {
    var df = scanSymbol(spark, symbol).select("timestamp")
    start.foreach(s => df = df.where(col("timestamp") >= java.sql.Timestamp.from(s)))
    end.foreach(e => df = df.where(col("timestamp") <= java.sql.Timestamp.from(e)))
    df.distinct()
  }

  /** Windowed read with latest-wins dedup (S3, reference
    * `source_reader.py:44-59`): one row per timestamp, the one with the
    * greatest (arrival_time, event_time, transact_time, update_id_end)
    * nulls-last tuple. */
  def readWindow(spark: SparkSession, symbol: String, start: Instant, end: Instant): DataFrame = {
    val df = scanSymbol(spark, symbol)
      .where(col("timestamp").between(
        java.sql.Timestamp.from(start), java.sql.Timestamp.from(end)))
    Ops.dedupKeepLast(df, Seq("timestamp"),
      Seq(col("arrival_time"), col("event_time"), col("transact_time"), col("update_id_end")))
  }

  /** Partition-directory snapshot for change detection (S5, reference
    * `source_reader.py:61-69`). */
  def partitionDirectories(spark: SparkSession, symbol: String): Set[String] = {
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val symbolRoot = new HPath(s"$lakeDir/symbol=${symbol.toUpperCase}")
    if (!fs.exists(symbolRoot)) Set.empty
    else {
      val it = fs.listFiles(symbolRoot, true)
      val dirs = scala.collection.mutable.Set[String]()
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          dirs += f.getPath.getParent.toString.stripPrefix(symbolRoot.toString).stripPrefix("/")
      }
      dirs.toSet
    }
  }
}
