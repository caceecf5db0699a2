package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase attribution for the engine-tier bench rows (guide §1: measure
  * first). Replicates the s16/s18 lifecycles step by step with a wall
  * stopwatch around each phase — the aggregate bench number cannot say
  * which ACTION inside the roundtrip owns the wall, and Spark 4 submits
  * command jobs from an async pool, so stack-based listener attribution
  * is blind there.
  *
  * Usage: runMain graft.tools.EnginePhaseProbe [sfDir]
  */
object EnginePhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    // job counter: noise-free structural evidence alongside the wall
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
      })
    def phase[A](name: String)(body: => A): A = {
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120) // listener drain
      println(f"   $wall%8.3f s  jobs=${jobCount.get() - j0}%-3d $name")
      r
    }

    def t(table: String): DataFrame = {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      val df = s.read.parquet(s"$sfDir/$table.parquet")
      df.schema.fields.filter(_.dataType.typeName == "timestamp_ntz")
        .foldLeft(df)((d, f) =>
          d.withColumn(f.name, col(f.name).cast(org.apache.spark.sql.types.TimestampType)))
    }
    def eventsK: DataFrame = t("events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("minute", date_trunc("minute", col("ts")))
    def wideCanon(df: DataFrame, bump: Double): DataFrame = {
      val g = df.groupBy(col("symbol"), col("minute").as("timestamp"))
        .agg((round(sum(col("value")), 4) + bump).as("open"))
        .withColumn("high", col("open") + 1.0)
        .withColumn("low", col("open") - 1.0)
        .withColumn("close", col("open") + 0.5)
        .withColumn("volume_btc", lit(1.0))
        .withColumn("volume_usdt", lit(100.0))
        .withColumn("trade_count", lit(10L))
        .withColumn("mark_price_open", col("open"))
        .withColumn("mark_price_close", col("open"))
        .withColumn("index_price_open", col("open"))
        .withColumn("index_price_close", col("open"))
      graft.schema.CanonicalSchema.columns.foldLeft(g) { (d, c) =>
        if (d.columns.contains(c.name)) d.withColumn(c.name, col(c.name).cast(c.sparkType))
        else d.withColumn(c.name, lit(null).cast(c.sparkType))
      }
    }

    // warm-up
    t("events").agg(max("ts")).collect()

    import graft.sources.{HtfLakeWriter, LakeLayout, MinuteLakeReader, MinuteLakeWriter, PartitionLedger}
    import graft.operators.AggregatorRunner

    val iters = sys.env.get("PROBE_ITERS").flatMap(_.toIntOption).getOrElse(3)
    for (it <- 1 to iters) {
    // ---------------- s16 phases ----------------
    println(s"== s16_wide_lake_roundtrip iter=$it")
    locally {
      val ev = eventsK.withColumn("symbol",
        concat(lit("SYM"), lpad((col("user_id") % 7).cast("string"), 2, "0"), lit("USDT")))
      val root = java.nio.file.Files.createTempDirectory("graft-probe-s16").toString
      try {
        val writer = new MinuteLakeWriter(root, new PartitionLedger(s"$root/_state"),
          LakeLayout.DayWide(filesPerDay = 4))
        phase("writeDaysWide(full corpus)") { writer.writeDaysWide(wideCanon(ev, 0.0)) }
        phase("writeDeltaPatch(error rows)") {
          writer.writeDeltaPatch(wideCanon(ev.where(col("event_type") === "error"), 1000.0)) }
        val b = phase("min/max collect") {
          ev.agg(min(col("minute")), max(col("minute"))).collect()(0) }
        phase("readWindowAllSymbols+agg+collect") {
          new MinuteLakeReader(root)
            .readWindowAllSymbols(s, b.getTimestamp(0).toInstant, b.getTimestamp(1).toInstant)
            .get.groupBy("symbol")
            .agg(count(lit(1)).as("n_minutes"),
              round(sum(col("open")), 2).as("sum_open"),
              round(max(col("open")), 4).as("max_open")).collect()
        }
      } finally {
        val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
          s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
      }
    }

    // ---------------- s18 phases ----------------
    println(s"== s18_gated_tick_roundtrip iter=$it")
    locally {
      val ev = eventsK.withColumn("symbol",
        concat(lit("SYM"), lpad((col("user_id") % 5).cast("string"), 2, "0"), lit("USDT")))
      val maxDay = ev.agg(date_trunc("day", max(col("minute")))).collect()(0).getTimestamp(0)
      val winLo = java.sql.Timestamp.from(
        maxDay.toInstant.minus(6, java.time.temporal.ChronoUnit.DAYS))
      val evw = ev.where(col("minute") >= winLo)
      val root = java.nio.file.Files.createTempDirectory("graft-probe-s18").toString
      try {
        val ledger = new PartitionLedger(s"$root/_state")
        val writer = new MinuteLakeWriter(root, ledger, LakeLayout.DayWide(filesPerDay = 4))
        phase("writeDaysWide(7d)") { writer.writeDaysWide(wideCanon(evw, 0.0)) }
        val reader = new MinuteLakeReader(root)
        val hw = new HtfLakeWriter(s"$root/htf", LakeLayout.DayWide(filesPerDay = 4))
        val state = new AggregatorRunner.AggregatorStateStore(s"$root/_aggstate")
        val spec = graft.schema.Timeframes.parse("15m")
        def tick() = AggregatorRunner.runIncrementalAll(s, reader, hw, state,
          s"$root/htf", spec, allowIncomplete = true,
          repairLookbackMinutes = 200000L, sourceLedger = Some(ledger))
        phase("tick1 backfill") { tick() }
        phase("tick2 steady") { tick() }
        phase("writeDeltaPatch(last day errors)") {
          writer.writeDeltaPatch(wideCanon(
            evw.where(col("event_type") === "error" && col("minute") >= maxDay), 1000.0)) }
        phase("tick3 patched") { tick() }
        phase("final summary") {
          s.read.parquet(s"$root/htf/timeframe=15m").groupBy("symbol")
            .agg(count(lit(1)).as("n_buckets"),
              round(sum(col("close")), 2).as("sum_close"),
              sum(col("trade_count")).as("sum_trades")).collect()
        }
      } finally {
        val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
          s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
      }
    }
    }
    spark.stop()
  }
}
