package graft.tools

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AggregatorRunner
import graft.operators.AggregatorRunner.AggregatorStateStore
import graft.schema.Timeframes
import graft.sources.{HtfLakeWriter, LakeLayout, MinuteLakeReader, MinuteLakeWriter, PartitionLedger}

/** Width-10k re-run of the lake legs under [[LakeLayout.DayWide]] —
  * the probe VERDICT r12 #1 demanded. The r12 width-10,000 probe
  * measured the reference-inherited hourly layout hitting a file-count
  * wall (240k files/day): day write ×10.7, HTF backfill ×16.0 for ×10
  * width, bulk day APPEND killed at the 2 h timeout. This probe runs
  * the SAME four legs with day-level partitions + symbol-range-sorted
  * files (files/day O(filesPerDay), width-independent) and prints the
  * per-leg walls for the annex table.
  *
  * Legs, per width:
  *  1. day write (overwrite)  — bootstrap day 1 via writeDaysWide
  *  2. HTF backfill           — runBackfillAll over the wide lake
  *  3. bulk day APPEND        — day 2 via writeDaysWide(merge = true)
  *                              (the leg that DNF'd under hourly)
  *  4. HTF tick + no-op tick  — runIncrementalAll twice; second must
  *                              write ZERO buckets (fingerprint skip)
  *
  * Run: `sbt "runMain graft.tools.WideWidthProbe [widthsCsv] [filesPerDay]"`
  * (defaults `1000,10000` / `32`).
  */
object WideWidthProbe {

  private val Day1 = Instant.parse("2026-01-14T00:00:00Z")
  private val Day2 = Instant.parse("2026-01-15T00:00:00Z")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  /** One day of canonical minutes for W symbols (probe-synthesized,
    * perf-only — DailyIngestDemo.writeDay's frame, unpartitioned). */
  private def dayFrame(spark: SparkSession, nSymbols: Int,
                       dayStart: Instant): DataFrame = {
    val minutes = 24 * 60
    val base = spark.range(nSymbols.toLong)
      .selectExpr("format_string('SYM%05d', id) AS symbol")
      .crossJoin(spark.range(minutes.toLong).select(
        (lit(dayStart.toEpochMilli) + col("id") * 60000L).as("ms"),
        (col("id") % 50).cast("double").as("step")))
      .select(col("symbol"), timestamp_millis(col("ms")).as("timestamp"),
        (lit(100.0) + col("step")).as("open"),
        (lit(101.0) + col("step")).as("high"),
        (lit(99.0) + col("step")).as("low"),
        (lit(100.5) + col("step")).as("close"),
        lit(1.2).as("volume_btc"), lit(120000.0).as("volume_usdt"),
        lit(10L).as("trade_count"),
        (lit(100.1) + col("step")).as("mark_price_open"),
        (lit(100.4) + col("step")).as("mark_price_close"),
        (lit(100.0) + col("step")).as("index_price_open"),
        (lit(100.2) + col("step")).as("index_price_close"))
    graft.schema.CanonicalSchema.columns.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c.name)) df.withColumn(c.name, col(c.name).cast(c.sparkType))
      else df.withColumn(c.name, lit(null).cast(c.sparkType))
    }
  }

  private def countFiles(fs: org.apache.hadoop.fs.FileSystem, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) return 0
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  def main(args: Array[String]): Unit = {
    val widths = args.headOption.getOrElse("1000,10000")
      .split(",").map(_.trim.toInt).toSeq
    val filesPerDay = args.lift(1).flatMap(_.toIntOption).getOrElse(32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft-wide-width").toString
    val spec = Timeframes.parse("1h")
    val layout = LakeLayout.DayWide(filesPerDay)

    for (w <- widths) {
      val root = s"$tmp/lake_$w"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
        spark.sparkContext.hadoopConfiguration)
      val writer = new MinuteLakeWriter(root, new PartitionLedger(s"$root/_state"), layout)
      val reader = new MinuteLakeReader(root)
      val htf = new HtfLakeWriter(s"$root/htf", layout)
      val state = new AggregatorStateStore(s"$root/_aggstate")

      // 1. day write (bootstrap)
      val (_, daySecs) = timed(writer.writeDaysWide(dayFrame(spark, w, Day1)))
      val filesAfterDay1 = countFiles(fs, s"$root/futures/um/minute")

      // 2. HTF backfill
      val (bf, bfSecs) = timed {
        AggregatorRunner.runBackfillAll(spark, reader, htf, state, s"$root/htf", spec)
      }

      // 3. bulk day APPEND (the hourly-layout DNF leg)
      val (_, appendSecs) = timed {
        writer.writeDaysWide(dayFrame(spark, w, Day2), merge = true)
      }
      val filesAfterDay2 = countFiles(fs, s"$root/futures/um/minute")

      // 4. HTF tick + no-op tick
      val (inc, tickSecs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, htf, state, s"$root/htf", spec)
      }
      val (noop, noopSecs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, htf, state, s"$root/htf", spec)
      }
      require(noop.bucketsWritten == 0,
        s"no-op tick wrote ${noop.bucketsWritten} buckets — write-skip regressed under wide layout")
      val htfFiles = countFiles(fs, s"$root/htf")

      println(f"[wide-width] width=$w%5d layout=day-wide($filesPerDay) " +
        f"dayWrite=$daySecs%.1f s (files=$filesAfterDay1) | " +
        f"htfBackfill=${bf.bucketsWritten} buckets $bfSecs%.1f s | " +
        f"bulkAppend=$appendSecs%.1f s (files=$filesAfterDay2) | " +
        f"htfTick=${inc.bucketsWritten} buckets $tickSecs%.1f s | " +
        f"noopTick=$noopSecs%.1f s | htfFiles=$htfFiles")
    }
    spark.stop()
  }
}
