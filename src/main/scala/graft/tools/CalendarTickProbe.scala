package graft.tools

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AggregatorRunner
import graft.operators.AggregatorRunner.AggregatorStateStore
import graft.schema.Timeframes
import graft.sources.{HtfLakeWriter, LakeLayout, MinuteLakeReader, MinuteLakeWriter, PartitionLedger}

/** Prices the completable-bucket gate (r15): a calendar/long-frame
  * incremental tick whose window holds only the CURRENT (incomplete)
  * bucket used to re-scan and re-aggregate bucket-to-date × width every
  * poll for zero writable output — on a 1d spec that is up to 24 h ×
  * width re-read every 30 s. The gate returns zeros from driver
  * arithmetic instead.
  *
  * Build: width-W day-wide lake, one COMPLETE day + `hours2` hours of
  * the next day; backfill folds day 1 and sets watermarks; then N
  * mid-bucket 1d ticks are timed. Run the same probe against the
  * pre-gate class snapshot (A/B binary protocol) for the before
  * number — the probe touches only AggregatorRunner surfaces whose
  * signatures are identical across the two snapshots.
  *
  * Run: `runMain graft.tools.CalendarTickProbe [width] [hours2] [nTicks]`
  * (defaults 2000, 3, 3).
  */
object CalendarTickProbe {

  private val Day1 = Instant.parse("2026-01-14T00:00:00Z")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  private def minutesFrame(spark: SparkSession, nSymbols: Int,
                           start: Instant, minutes: Int): DataFrame = {
    val base = spark.range(nSymbols.toLong)
      .selectExpr("format_string('SYM%05d', id) AS symbol")
      .crossJoin(spark.range(minutes.toLong).select(
        (lit(start.toEpochMilli) + col("id") * 60000L).as("ms"),
        (col("id") % 50).cast("double").as("step")))
      .select(col("symbol"), timestamp_millis(col("ms")).as("timestamp"),
        (lit(100.0) + col("step")).as("open"),
        (lit(101.0) + col("step")).as("high"),
        (lit(99.0) + col("step")).as("low"),
        (lit(100.5) + col("step")).as("close"),
        lit(1.2).as("volume_btc"), lit(120000.0).as("volume_usdt"),
        lit(10L).as("trade_count"),
        lit(100.1).as("mark_price_open"), lit(100.4).as("mark_price_close"),
        lit(100.0).as("index_price_open"), lit(100.2).as("index_price_close"))
    graft.schema.CanonicalSchema.columns.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c.name)) df.withColumn(c.name, col(c.name).cast(c.sparkType))
      else df.withColumn(c.name, lit(null).cast(c.sparkType))
    }
  }

  def main(args: Array[String]): Unit = {
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(2000)
    val hours2 = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val nTicks = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-caltick").toString
    val writer = new MinuteLakeWriter(root, new PartitionLedger(s"$root/_state"),
      LakeLayout.DayWide(filesPerDay = 8))
    val reader = new MinuteLakeReader(root)
    val htf = new HtfLakeWriter(s"$root/htf", LakeLayout.DayWide(8))
    val state = new AggregatorStateStore(s"$root/_aggstate")
    val spec = Timeframes.parse("1d")

    val (_, buildSecs) = timed {
      writer.writeDaysWide(minutesFrame(spark, width, Day1, 1440 + hours2 * 60))
    }
    val (bf, bfSecs) = timed {
      AggregatorRunner.runBackfillAll(spark, reader, htf, state, s"$root/htf", spec)
    }
    println(f"[cal-tick] width=$width day2=${hours2}h build=$buildSecs%.1f s " +
      f"backfill=$bfSecs%.1f s (wrote=${bf.bucketsWritten})")

    (1 to nTicks).foreach { i =>
      val (res, secs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, htf, state,
          s"$root/htf", spec)
      }
      println(f"[cal-tick] width=$width tick#$i wall=$secs%.2f s " +
        f"scanned=${res.bucketsScanned} written=${res.bucketsWritten} " +
        f"lag=${res.lagMinutes}")
    }
    spark.stop()
  }
}
