package graft.tools

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AggregatorRunner
import graft.operators.AggregatorRunner.AggregatorStateStore
import graft.schema.Timeframes
import graft.sources.{HtfLakeWriter, LakeLayout, MinuteLakeReader, MinuteLakeWriter, PartitionLedger}

/** Prices the incremental tick's HTF-INDEX reads at tree depth (r15):
  * `runIncremental{,All}` consulted the existing-bucket index with a
  * WHOLE-tree read per tick (O(files) LISTs + an O(history) scan, and
  * the single-symbol path did it twice) even though every consumer —
  * repaired-count semi-join, fingerprint compare, watermark advance —
  * is bounded by the repair window. The bounded variant descends only
  * the window's day dirs.
  *
  * Build: width-W day-wide minute lake of `days` days (1h-complete
  * buckets throughout) + 2 h of the next day, backfill (deep REAL HTF
  * tree + watermarks), then N timed 1h ticks whose repair window is
  * the trailing 2 h. A 1h tick is never gated (its window always holds
  * a completable bucket), so what varies with `days` is exactly the
  * index-read cost. Run against the pre-change class snapshot for the
  * before number (A/B binary protocol — only AggregatorRunner differs).
  *
  * Run: `runMain graft.tools.HtfDepthProbe [width] [days] [nTicks]`
  * (defaults 100, 180, 3).
  */
object HtfDepthProbe {

  private val Day1 = Instant.parse("2025-01-01T00:00:00Z")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  private[tools] def minutesFrame(spark: SparkSession, nSymbols: Int,
                                  start: Instant, minutes: Long): DataFrame = {
    val base = spark.range(nSymbols.toLong)
      .selectExpr("format_string('SYM%05d', id) AS symbol")
      .crossJoin(spark.range(minutes).select(
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
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(100)
    val days = args.lift(1).flatMap(_.toIntOption).getOrElse(180)
    val nTicks = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-htfdepth").toString
    val writer = new MinuteLakeWriter(root, new PartitionLedger(s"$root/_state"),
      LakeLayout.DayWide(filesPerDay = 4))
    val reader = new MinuteLakeReader(root)
    val htf = new HtfLakeWriter(s"$root/htf", LakeLayout.DayWide(4))
    val state = new AggregatorStateStore(s"$root/_aggstate")
    val spec = Timeframes.parse("1h")

    val totalMinutes = days.toLong * 1440L + 120L
    val (_, buildSecs) = timed {
      writer.writeDaysWide(minutesFrame(spark, width, Day1, totalMinutes))
    }
    val (bf, bfSecs) = timed {
      AggregatorRunner.runBackfillAll(spark, reader, htf, state, s"$root/htf", spec)
    }
    println(f"[htf-depth] width=$width days=$days build=$buildSecs%.1f s " +
      f"backfill=$bfSecs%.1f s (wrote=${bf.bucketsWritten})")

    (1 to nTicks).foreach { i =>
      val (res, secs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, htf, state,
          s"$root/htf", spec)
      }
      println(f"[htf-depth] width=$width days=$days tickAll#$i wall=$secs%.2f s " +
        f"scanned=${res.bucketsScanned} written=${res.bucketsWritten}")
    }
    // single-symbol tick (the path that read the full index TWICE)
    (1 to nTicks).foreach { i =>
      val (res, secs) = timed {
        AggregatorRunner.runIncremental(spark, reader, htf, state,
          s"$root/htf", "SYM00004", spec)
      }
      println(f"[htf-depth] width=$width days=$days tickOne#$i wall=$secs%.2f s " +
        f"scanned=${res.bucketsScanned} written=${res.bucketsWritten} " +
        f"lag=${res.lagMinutes}")
    }
    // a late repair within the lookback still lands (sanity, both binaries)
    val patchHour = Day1.plus(days.toLong, ChronoUnit.DAYS)
    // the writer stamps the target symbol over the frame's own column
    writer.writeHourPartition("SYM00004", patchHour,
      minutesFrame(spark, 1, patchHour, 60))
    val (rep, repSecs) = timed {
      AggregatorRunner.runIncrementalAll(spark, reader, htf, state, s"$root/htf", spec)
    }
    println(f"[htf-depth] width=$width days=$days repairTick wall=$repSecs%.2f s " +
      f"written=${rep.bucketsWritten} repaired=${rep.repaired}")

    // absent-symbol probe: registry short-circuit vs the registry-less
    // backward walk (delete the registry for the before-number — the
    // advisory-fallback contract makes both legs return None)
    val fsP = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val (a1, s1) = timed(reader.latestMinute(spark, "NOSUCHSYM"))
    fsP.delete(new org.apache.hadoop.fs.Path(
      s"$root/futures/um/minute/${MinuteLakeWriter.SymbolsRegistry}"), false)
    val (a2, s2) = timed(reader.latestMinute(spark, "NOSUCHSYM"))
    println(f"[htf-depth] width=$width days=$days absentProbe " +
      f"registry=$s1%.3f s walk=$s2%.2f s bothNone=${a1.isEmpty && a2.isEmpty}")
    spark.stop()
  }
}
