package graft.tools

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AggregatorRunner
import graft.operators.AggregatorRunner.AggregatorStateStore
import graft.schema.Timeframes
import graft.sources.{HtfLakeWriter, LakeLayout, LakeMigrate, MinuteLakeReader, MinuteLakeWriter, PartitionLedger}

/** Production-width migration + point-repair probe (VERDICT r13 #1/#6).
  *
  * Builds the shape a real adopter holds — a width-W HOURLY lake (one
  * day, W × 24 files) — then measures:
  *
  *  1. MIGRATION  `LakeMigrate.hourlyToDayWide` wall + parity report at
  *     production width (spec-pinned only on small fixtures before).
  *  2. POINT REPAIR on the migrated wide lake: a 1-symbol-hour late
  *     patch (60 rows) through `writeHourPartition` — the delta path —
  *     vs the same patch through `writeDaysWide(merge=true)` (what
  *     every patch paid before): O(patch) vs O(day).
  *  3. READ-WITH-DELTA: the patched window read back (overlay cost) and
  *     a full repair tick (`runIncrementalAll`) over base+delta.
  *  4. COMPACTION  `compactWideDeltas` folding the patches back — the
  *     amortized day-merge, paid once per threshold instead of once per
  *     patch.
  *
  * Run: `sbt "runMain graft.tools.PointRepairProbe [width] [filesPerDay]"`
  * (defaults 10000 / 32).
  *
  * `wideonly` as the 3rd arg (VERDICT r14 #8) skips legs 0–1 (the
  * hourly strawman + migration — at width 100k the hourly build alone
  * is 2.4M files, hours of setup for legs that were already measured
  * at width 10k) and bulk-builds the day-wide lake directly, so the
  * width-100k run measures exactly what the verdict asks: patch cost
  * O(patch), overlay read, repair tick, and one-day-merge compaction
  * at the layout's documented design point.
  */
object PointRepairProbe {

  private val Day1 = Instant.parse("2026-01-14T00:00:00Z")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  /** One day of canonical minutes for W symbols (perf-only synth). */
  private def dayFrame(spark: SparkSession, nSymbols: Int, dayStart: Instant,
                       openBase: Double = 100.0, hours: Int = 24): DataFrame = {
    val minutes = hours * 60
    val base = spark.range(nSymbols.toLong)
      .selectExpr("format_string('SYM%05d', id) AS symbol")
      .crossJoin(spark.range(minutes.toLong).select(
        (lit(dayStart.toEpochMilli) + col("id") * 60000L).as("ms"),
        (col("id") % 50).cast("double").as("step")))
      .select(col("symbol"), timestamp_millis(col("ms")).as("timestamp"),
        (lit(openBase) + col("step")).as("open"),
        (lit(openBase + 1.0) + col("step")).as("high"),
        (lit(openBase - 1.0) + col("step")).as("low"),
        (lit(openBase + 0.5) + col("step")).as("close"),
        lit(1.2).as("volume_btc"), lit(120000.0).as("volume_usdt"),
        lit(10L).as("trade_count"),
        (lit(openBase + 0.1) + col("step")).as("mark_price_open"),
        (lit(openBase + 0.4) + col("step")).as("mark_price_close"),
        (lit(openBase) + col("step")).as("index_price_open"),
        (lit(openBase + 0.2) + col("step")).as("index_price_close"))
    graft.schema.CanonicalSchema.columns.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c.name)) df.withColumn(c.name, col(c.name).cast(c.sparkType))
      else df.withColumn(c.name, lit(null).cast(c.sparkType))
    }
  }

  def main(args: Array[String]): Unit = {
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(10000)
    val filesPerDay = args.lift(1).flatMap(_.toIntOption).getOrElse(32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wideOnly = args.lift(2).contains("wideonly")
    val tmp = java.nio.file.Files.createTempDirectory("graft-point-repair").toString
    val hRoot = s"$tmp/hourly"
    val wRoot = s"$tmp/wide"

    val writer = new MinuteLakeWriter(wRoot, new PartitionLedger(s"$wRoot/_state"),
      LakeLayout.DayWide(filesPerDay))

    if (wideOnly) {
      // direct day-wide bootstrap — the lake an adopter holds AFTER
      // migration; legs 0–1 were measured at width 10k (r14 annex)
      val (_, buildSecs) = timed(writer.writeDaysWide(dayFrame(spark, width, Day1)))
      println(f"[point-repair] width=$width wide bulk build=$buildSecs%.1f s (wideonly)")
    } else {
      // ---- 0. the adopter's lake: width-W hourly, one day (W × 24 files)
      val (_, buildSecs) = timed {
        dayFrame(spark, width, Day1)
          .withColumn("year", date_format(col("timestamp"), "yyyy"))
          .withColumn("month", date_format(col("timestamp"), "MM"))
          .withColumn("day", date_format(col("timestamp"), "dd"))
          .withColumn("hour", date_format(col("timestamp"), "HH"))
          .repartition(col("symbol"))
          .write.mode("overwrite")
          .partitionBy("symbol", "year", "month", "day", "hour")
          .option("compression", "zstd")
          .parquet(s"$hRoot/futures/um/minute")
      }
      println(f"[point-repair] width=$width hourly build=$buildSecs%.1f s")

      // ---- 1. migration at production width
      val (report, migSecs) = timed {
        LakeMigrate.hourlyToDayWide(spark, hRoot, wRoot, filesPerDay)
      }
      println(f"[point-repair] migrate width=$width wall=$migSecs%.1f s " +
        f"rows=${report.rows} symbols=${report.symbols} parityOk=${report.parityOk} " +
        f"mismatches=${report.mismatches}")
      require(report.parityOk, "migration parity failed at production width")
    }
    val reader = new MinuteLakeReader(wRoot)

    // ---- 2. point repair: 1 symbol-hour (60 rows), delta vs day-rewrite
    val patchHour = Instant.parse("2026-01-14T07:00:00Z")
    def patchFrame(openBase: Double) =
      dayFrame(spark, 1, patchHour, openBase, hours = 1)
        .withColumn("symbol", lit("SYM00042"))
    val (_, deltaSecs) = timed {
      writer.writeHourPartition("SYM00042", patchHour, patchFrame(500.0).drop("symbol"))
    }
    val (_, daySecs) = timed {
      writer.writeDaysWide(patchFrame(600.0), merge = true)
    }
    println(f"[point-repair] width=$width patch=60rows " +
      f"deltaPath=$deltaSecs%.1f s vs dayRewrite=$daySecs%.1f s " +
      f"(x${daySecs / deltaSecs}%.1f)")

    // ---- 3. read-back with the overlay + a full repair tick
    val (row, readSecs) = timed {
      writer.writeHourPartition("SYM00042", patchHour, patchFrame(700.0).drop("symbol"))
      reader.readWindow(spark, "SYM00042", patchHour,
        Instant.parse("2026-01-14T07:59:00Z"))
        .agg(count(lit(1)), min("open"), max("open")).collect()(0)
    }
    require(row.getLong(0) == 60 && row.getDouble(1) == 700.0,
      s"overlay read wrong: $row")
    val htf = new HtfLakeWriter(s"$wRoot/htf", LakeLayout.DayWide(filesPerDay))
    val state = new AggregatorStateStore(s"$wRoot/_aggstate")
    val spec = Timeframes.parse("1h")
    val (_, bfSecs) = timed {
      AggregatorRunner.runBackfillAll(spark, reader, htf, state, s"$wRoot/htf", spec)
    }
    val (tick, tickSecs) = timed {
      AggregatorRunner.runIncrementalAll(spark, reader, htf, state, s"$wRoot/htf", spec)
    }
    println(f"[point-repair] width=$width patchedRead=$readSecs%.1f s | " +
      f"htfBackfill=$bfSecs%.1f s | repairTick(base+delta)=$tickSecs%.1f s " +
      f"(wrote=${tick.bucketsWritten})")

    // ---- 4. compaction folds the deltas once
    val (folded, compactSecs) = timed(writer.compactWideDeltas(spark))
    val post = reader.readWindow(spark, "SYM00042", patchHour,
      Instant.parse("2026-01-14T07:59:00Z"))
      .agg(min("open")).collect()(0).getDouble(0)
    require(post == 700.0, s"post-compaction read drifted: $post")
    println(f"[point-repair] width=$width compact=${folded.size} days " +
      f"$compactSecs%.1f s (reads unchanged)")
    spark.stop()
  }
}
