package graft.tools

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{AggregatorRunner, DedupOps, GraphOps}
import graft.operators.AggregatorRunner.AggregatorStateStore
import graft.pipeline.Orchestrator
import graft.pipeline.Orchestrator.{BandCollector, MinutePipeline, Settings, SourceBatch}
import graft.schema.Timeframes
import graft.sources.{HtfLakeWriter, MinuteLakeReader, MinuteLakeWriter, PartitionLedger, WatermarkStore}

/** Daily-ingestion END-TO-END demo (VERDICT r10 #1): the one run a
  * 100 TB operator would actually schedule every day, as a single
  * narrative with per-phase wall clocks instead of ten per-operator
  * proofs.
  *
  * The day's tick, per lake width W (symbols):
  *
  *  1. INGEST, per-symbol band path — the orchestrator's
  *     `run_until_target` for ONE representative symbol over the new
  *     day's 24 hourly windows (fixture sources, as the reference's
  *     fake providers): HOT/WARM band choice per window age,
  *     write-then-advance idempotency. This is the per-symbol unit
  *     cost. NOTE (r12, measured): the per-symbol path is DRIVER-bound
  *     (many small jobs), so concurrent driver tasks do NOT make the
  *     fleet wall equal the unit wall — 32 concurrent symbol-days ran
  *     12× the unit (2.7× over serial). The fleet-scale daily ingest
  *     is the BULK path (phase 2); the band path is the
  *     incremental-repair tool. The `fleetN` leg measures this.
  *  2. INGEST, bulk width path — today's canonical minutes for ALL W
  *     symbols land as ONE partitioned append (the cluster shape:
  *     collection fans out per symbol, the build+write is one Spark
  *     job; no per-symbol planning loop).
  *  3. HTF TICK — `runIncrementalAll` picks the new day up from the
  *     watermarks and writes today's buckets for every symbol in one
  *     job (partition-descent latest discovery, pruned repair reads).
  *  4. HTF NO-OP TICK — the same call again with no news: the
  *     content-fingerprint write-skip must write ZERO buckets (the
  *     steady-state cadence cost at any width).
  *  5. DEDUP INCREMENT — today's new documents (realistic increment:
  *     `newFrac` of the corpus, 90% globally-novel / 10% verbatim
  *     copies, as IncrementalCcProbe's realistic mode) close against
  *     yesterday's assignment via `GraphOps.incrementalComponents`;
  *     only delta-incident components re-close. Yesterday's full
  *     closure is computed once here (production loads it) and
  *     reported as the amortized setup cost it is.
  *
  * The summary line per width is the DAILY TICK WALL = bulk ingest +
  * HTF tick + dedup phase 2 — what the operator's scheduler sees.
  *
  * Run: `sbt "runMain graft.tools.DailyIngestDemo [widthsCsv] [corpusDir]
  * [newFrac] [dedupMode] [fleetN] [layout]"` (defaults `100,1000`,
  * `/root/testdata/sf0.1`, `0.02`, `bucket`, `32`, `hourly`). Use a
  * ScaleProbe-derived novel-mode corpus dir for the decade-scale run;
  * `layout=wide` runs the lake legs on the day-wide layout (the
  * width-≥10k shape — run with widths `10000` to reproduce the
  * §8.16 table; the per-symbol orchestrator leg stays hourly, as the
  * incremental-repair tool it is).
  *
  *  - `dedupMode=verified` swaps the dedup leg to the HIGH-RECALL
  *    production shape (dedup_cc_verified_incremental's construction):
  *    phase 1 closes yesterday over est-gated + exact-Jaccard-VERIFIED
  *    edges; phase 2 gates and verifies only the pairs incident to
  *    today's new docs before the incremental re-close. The est-gate
  *    runs inside the candidate join in whole-stage codegen, which is
  *    what keeps the per-tick verification volume increment-sized.
  *  - `fleetN>0` adds the orchestrator FLEET honesty check at the last
  *    width: N symbols run `runUntilTarget` CONCURRENTLY as independent
  *    driver tasks sharing the session (the reference's
  *    one-asyncio-task-per-symbol shape), and the measured fleet wall
  *    is reported against unit × N / slots — the demo stops asserting
  *    "the fleet wall equals the unit cost" and measures it.
  */
object DailyIngestDemo {

  private val Day1 = Instant.parse("2026-01-14T00:00:00Z")
  private val Day2 = Instant.parse("2026-01-15T00:00:00Z")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  /** One day of canonical minutes for W symbols (probe-synthesized,
    * perf-only), written as a partitioned minute lake — `append` lands
    * a NEW day's partitions next to existing ones (the bulk daily
    * ingest); `overwrite` bootstraps the history. With
    * `layout = wide` the write goes through
    * [[graft.sources.MinuteLakeWriter.writeDaysWide]] (day-level
    * partitions, symbol-sorted files — the width-≥10k shape, SURVEY
    * §8.16) instead of the hourly partitionBy. */
  private def writeDay(spark: SparkSession, root: String, nSymbols: Int,
                       dayStart: Instant, mode: String,
                       layout: graft.sources.LakeLayout): Long = {
    val minutes = 24 * 60
    val base = spark.range(nSymbols.toLong)
      .selectExpr("format_string('SYM%04d', id) AS symbol")
      .crossJoin(spark.range(minutes.toLong).select(
        (lit(dayStart.toEpochMilli) + col("id") * 60000L).as("ms"),
        (col("id") % 50).cast("double").as("step")))
      .select(col("symbol"), timestamp_millis(col("ms")).as("timestamp"),
        (lit(100.0) + col("step")).as("open"),
        (lit(101.0) + col("step")).as("high"),
        (lit(99.0) + col("step")).as("low"),
        (lit(100.5) + col("step")).as("close"),
        lit(1.2).as("volume_btc"), lit(120000.0).as("volume_usdt"),
        lit(10L).as("trade_count"))
    val withCanon = graft.schema.CanonicalSchema.columns.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c.name)) df.withColumn(c.name, col(c.name).cast(c.sparkType))
      else df.withColumn(c.name, lit(null).cast(c.sparkType))
    }
    layout match {
      case w: graft.sources.LakeLayout.DayWide =>
        new graft.sources.MinuteLakeWriter(root,
          new PartitionLedger(s"$root/_state"), w)
          .writeDaysWide(withCanon, merge = mode == "append")
      case graft.sources.LakeLayout.HourlySymbol =>
        withCanon
          .withColumn("year", date_format(col("timestamp"), "yyyy"))
          .withColumn("month", date_format(col("timestamp"), "MM"))
          .withColumn("day", date_format(col("timestamp"), "dd"))
          .withColumn("hour", date_format(col("timestamp"), "HH"))
          .repartition(col("symbol"))
          .write.mode(mode)
          .partitionBy("symbol", "year", "month", "day", "hour")
          .parquet(s"$root/futures/um/minute")
    }
    nSymbols.toLong * minutes
  }

  /** Fixture sources spanning the whole new day (the spine join bounds
    * each hourly window) — the shapes MinuteBuilder consumes. */
  private def dayCollector(spark: SparkSession, dayStart: Instant): BandCollector = {
    import spark.implicits._
    val minutes = 24 * 60
    val t0 = dayStart.toEpochMilli
    val klines = (0 until minutes).map { i =>
      (t0 + 60000L * i, 100.0 + i % 50, 101.0 + i % 50, 99.0 + i % 50,
        100.5 + i % 50, 2.0, 200.0, 10L, 1.0, 100.0)
    }.toDF("open_time", "open", "high", "low", "close", "volume_btc",
      "volume_usdt", "trade_count", "taker_buy_vol_btc", "taker_buy_vol_usdt")
    def aux(prefix: String) = (0 until minutes).map { i =>
      (t0 + 60000L * i, 100.0 + i % 50, 100.5 + i % 50)
    }.toDF("open_time", s"${prefix}_open", s"${prefix}_close")
    val trades = (0 until minutes).map { i =>
      (1000L + i, 100.0, 2.0, 1L, 2L, t0 + 60000L * i + 500, false)
    }.toDF("agg_trade_id", "price", "qty", "first_trade_id", "last_trade_id",
      "transact_time", "is_buyer_maker")
    new BandCollector {
      def vision(s: Instant, e: Instant): SourceBatch = SourceBatch()
      def rest(s: Instant, e: Instant): SourceBatch =
        SourceBatch(klines = Some(klines),
          markPriceKlines = Some(aux("mark_price")),
          indexPriceKlines = Some(aux("index_price")),
          aggTrades = Some(trades))
      // live trades present so WARM windows (which discard REST trades)
      // still carry trade columns, as a live-collector deployment would
      def liveAggTrades(s: Instant, e: Instant): Option[DataFrame] = Some(trades)
    }
  }

  def main(args: Array[String]): Unit = {
    // widthsCsv "none" skips the lake legs — reruns of the dedup leg on
    // a bigger corpus don't have to repay the 1000-symbol lake setup
    val widths = args.headOption.getOrElse("100,1000") match {
      case "none" => Seq.empty[Int]
      case s => s.split(",").map(_.trim.toInt).toSeq
    }
    val corpusDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val newFrac = args.lift(2).flatMap(_.toDoubleOption).getOrElse(0.02)
    val dedupMode = args.lift(3).getOrElse("bucket")
    require(Set("bucket", "verified")(dedupMode), s"dedupMode bucket|verified, got $dedupMode")
    val fleetN = args.lift(4).flatMap(_.toIntOption).getOrElse(32)
    val layout: graft.sources.LakeLayout = args.lift(5).getOrElse("hourly") match {
      case "wide" => graft.sources.LakeLayout.DayWide()
      case "hourly" => graft.sources.LakeLayout.HourlySymbol
      case other => sys.error(s"layout hourly|wide, got $other")
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.NativeVectorExprs.register(spark)

    val tmp = java.nio.file.Files.createTempDirectory("graft-daily").toString
    val spec = Timeframes.parse("1h")

    // ---------------------------------------------------------- lake legs
    for (w <- widths) {
      val root = s"$tmp/lake_$w"
      // yesterday: one day of history + its HTF backfill (one-time setup,
      // amortized across every later tick — reported, not part of the tick)
      val (nHist, histSecs) = timed(writeDay(spark, root, w, Day1, "overwrite", layout))
      val reader = new MinuteLakeReader(root)
      val writer = new HtfLakeWriter(s"$root/htf", layout)
      val state = new AggregatorStateStore(s"$root/_aggstate")
      val (bf, bfSecs) = timed {
        AggregatorRunner.runBackfillAll(spark, reader, writer, state, s"$root/htf", spec)
      }
      println(f"[daily] width=$w%4d SETUP history=$nHist rows ($histSecs%.1f s) " +
        f"htfBackfill=${bf.bucketsWritten} buckets ($bfSecs%.1f s)")

      // ---- 1. per-symbol orchestrator ingest of the new day (unit cost)
      val orchRoot = s"$tmp/orch_$w"
      val orchWriter = new MinuteLakeWriter(orchRoot, new PartitionLedger(s"$orchRoot/_state"))
      val orchWm = new WatermarkStore(s"$orchRoot/_wm")
      orchWm.set("SYM0000", Day2.minus(1, ChronoUnit.MINUTES))
      val pipe = new MinutePipeline(spark, Settings("SYM0000"),
        dayCollector(spark, Day2), orchWriter, orchWm)
      val nowForBand = Day2.plus(24, ChronoUnit.HOURS).plus(3, ChronoUnit.MINUTES)
      val (orchRes, orchSecs) = timed {
        pipe.runUntilTarget(Day2.plus(24, ChronoUnit.HOURS)
          .minus(1, ChronoUnit.MINUTES), nowForBand = nowForBand)
      }
      val bandMix = orchRes.bandsUsed.groupBy(identity)
        .map { case (b, xs) => s"$b×${xs.size}" }.toSeq.sorted.mkString(",")
      println(f"[daily] width=$w%4d 1.orchestratorDay symbol=1 " +
        f"windows=${orchRes.partitionsCommitted} bands=$bandMix " +
        f"wall=$orchSecs%.1f s (${orchSecs / orchRes.partitionsCommitted.max(1)}%.2f s/window; " +
        f"per-symbol unit — symbols parallelize as driver tasks)")

      // ---- 1b. fleet honesty check (last width only): N symbols run the
      // SAME day concurrently as independent driver tasks sharing the
      // session — measures what "symbols parallelize as driver tasks"
      // actually costs when N tasks contend for the local[32] slots,
      // instead of asserting fleet wall = unit wall
      if (fleetN > 0 && w == widths.last) {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(fleetN)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val fleetRoot = s"$tmp/fleet_$w"
        val (fleetRes, fleetSecs) = timed {
          try {
          val fs = (0 until fleetN).map { i =>
            Future {
              val sym = f"SYM$i%04d"
              val wroot = s"$fleetRoot/$sym"
              // per-symbol lake + state roots: the reference's per-symbol
              // tasks are fully independent; sharing one ledger file from
              // N threads would measure file-lock contention the
              // production layout doesn't have
              val fw = new MinuteLakeWriter(wroot, new PartitionLedger(s"$wroot/_state"))
              val fwm = new WatermarkStore(s"$wroot/_wm")
              fwm.set(sym, Day2.minus(1, ChronoUnit.MINUTES))
              new MinutePipeline(spark, Settings(sym),
                dayCollector(spark, Day2), fw, fwm)
                .runUntilTarget(Day2.plus(24, ChronoUnit.HOURS)
                  .minus(1, ChronoUnit.MINUTES), nowForBand = nowForBand)
            }
          }
          Await.result(Future.sequence(fs), Duration.Inf)
          // a throwing future must not leak the fleetN-thread executor
          // for the rest of the demo run
          } finally pool.shutdown()
        }
        val windows = fleetRes.map(_.partitionsCommitted).sum
        println(f"[daily] width=$w%4d 1b.fleet symbols=$fleetN windows=$windows " +
          f"wall=$fleetSecs%.1f s — vs unit×N=${orchSecs * fleetN}%.1f s serial; " +
          f"speedup=${orchSecs * fleetN / fleetSecs}%.1fx, " +
          f"fleetWall/unitWall=${fleetSecs / orchSecs}%.2fx")
      }

      // ---- 2. bulk width ingest: today's minutes for ALL symbols, one job
      val (nNew, ingestSecs) = timed(writeDay(spark, root, w, Day2, "append", layout))
      // ---- 3. HTF tick picks the day up from the watermarks
      val (inc, tickSecs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, writer, state, s"$root/htf", spec)
      }
      // ---- 4. the no-news cadence: fingerprint write-skip ⇒ ZERO writes
      val (noop, noopSecs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, writer, state, s"$root/htf", spec)
      }
      require(noop.bucketsWritten == 0,
        s"no-op tick wrote ${noop.bucketsWritten} buckets — write-skip regressed")
      // ---- 4b. the same cadence with the ledger gate (r16): the tick
      // must token-skip at file-read cost — one gated FULL tick records
      // the token, then the steady tick is driver-only
      val lg = Some(new PartitionLedger(s"$root/_state"))
      AggregatorRunner.runIncrementalAll(spark, reader, writer, state,
        s"$root/htf", spec, sourceLedger = lg)
      val (gated, gatedSecs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, writer, state,
          s"$root/htf", spec, sourceLedger = lg)
      }
      require(gated.bucketsScanned == 0 && gated.bucketsWritten == 0,
        s"gated no-news tick did work: $gated — ledger token gate regressed")
      println(f"[daily] width=$w%4d 2.bulkIngest rows=$nNew wall=$ingestSecs%.1f s | " +
        f"3.htfTick buckets=${inc.bucketsWritten} wall=$tickSecs%.1f s | " +
        f"4.noopTick buckets=0 wall=$noopSecs%.1f s | " +
        f"4b.gatedNoop wall=$gatedSecs%.3f s")
      println(f"[daily] width=$w%4d DAILY-TICK-WALL(lake)=${ingestSecs + tickSecs}%.1f s " +
        f"(+ $noopSecs%.1f s per later no-news cadence)")
    }

    // ---------------------------------------------------------- dedup leg
    val existing = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select("doc_id", "text")
    val nExisting = existing.count()
    // realistic increment (IncrementalCcProbe's mode): deterministic
    // md5 pick, 90% novel token streams / 10% verbatim copies
    val pick = conv(substring(md5(concat(lit("inc"), col("doc_id"))), 1, 6), 16, 10)
      .cast("long")
    // offset above the ACTUAL id space — a fixed +1e9 collided with
    // most real ids on the derived corpora (r13 find)
    val idOffset = existing.agg(max("doc_id")).head.getLong(0) + 1L
    val newDocs = existing
      .withColumn("r", pick % 10000L)
      .where(col("r") < lit((newFrac * 10000).toLong))
      .withColumn("novel", col("r") % 10 < 9)
      .select((col("doc_id") + lit(idOffset)).as("doc_id"),
        when(col("novel"), concat_ws(" ",
          (1 to 50).map(i => md5(concat(col("doc_id"), lit(s"-tok$i")))): _*))
          .otherwise(col("text")).as("text"),
        lit(true).as("is_new"))
    val corpus = existing.withColumn("is_new", lit(false)).unionByName(newDocs)
      .localCheckpoint()
    val n = corpus.count()
    val nNewDocs = corpus.where(col("is_new")).count()

    val (bands, rows) = TextFns.minhashGeometryFor(16, n, targetBucketSize = 128)
    def bandExprsOf(sigCol: String) = (0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rows).map(r => col(sigCol).getItem(b * rows + r).cast("string")): _*))
    }

    val (nComps, p1Secs, p2Secs) = dedupMode match {
      case "verified" =>
        // HIGH-RECALL production shape (dedup_cc_verified_incremental):
        // one tokenize+shingle pass feeds both the signatures and the
        // exact verification; the est-gate collapses candidates in
        // whole-stage codegen BEFORE the pair shuffle, so phase 2's
        // verification volume stays incident-to-the-increment
        val docsSh = corpus
          .select(col("doc_id"), TextFns.shingleHashesFromText("text", 3).as("sh"),
            col("is_new"))
          .localCheckpoint()
        val withSig = docsSh
          .select(col("doc_id"), col("is_new"), TextFns.minhashSignature("sh", 16).as("sig"))
        val bandsDf = withSig
          .select(col("doc_id"), col("sig"), col("is_new"),
            explode(array(bandExprsOf("sig"): _*)).as("bucket"))
          .localCheckpoint()
        val sh = docsSh.select(col("doc_id"), col("sh"))
        val (assign, p1) = timed {
          GraphOps.connectedComponents(
            corpus.where(!col("is_new")).select(col("doc_id").as("id")),
            DedupOps.verifiedEdges(
              DedupOps.allPairCandidates(bandsDf.where(!col("is_new"))), sh))
            .localCheckpoint()
        }
        val (nc, p2) = timed {
          GraphOps.incrementalComponents(assign,
            corpus.where(col("is_new")).select(col("doc_id").as("id")),
            DedupOps.verifiedEdges(DedupOps.incidentCandidates(bandsDf), sh))
            .select(countDistinct(col("component_id"))).collect()(0).getLong(0)
        }
        (nc, p1, p2)

      case _ =>
        val withSig = corpus.withColumn("sig", TextFns.minhashSignatureFromText("text", 3, 16))
        val bandsDf = withSig
          .select(col("doc_id"), explode(array(bandExprsOf("sig"): _*)).as("bucket"),
            col("is_new"))
          .localCheckpoint()
        def starEdges(bk: DataFrame): DataFrame = {
          val bmin = bk.groupBy("bucket").agg(min(col("doc_id")).as("src"))
          bk.join(bmin, Seq("bucket"))
            .where(col("src") < col("doc_id"))
            .select(col("src"), col("doc_id").as("dst")).distinct()
        }
        // yesterday's closure — production LOADS this assignment; computing
        // it here is the demo's setup cost, amortized over every later day
        val (assign, p1) = timed {
          GraphOps.connectedComponents(
            corpus.where(!col("is_new")).select(col("doc_id").as("id")),
            starEdges(bandsDf.where(!col("is_new"))))
            .localCheckpoint()
        }
        val touched = bandsDf.where(col("is_new")).select("bucket").distinct()
          .localCheckpoint()
        val (nc, p2) = timed {
          val touchedEdges = starEdges(
            bandsDf.join(broadcast(touched), Seq("bucket")).select("doc_id", "bucket"))
          GraphOps.incrementalComponents(assign,
            corpus.where(col("is_new")).select(col("doc_id").as("id")),
            touchedEdges)
            .select(countDistinct(col("component_id"))).collect()(0).getLong(0)
        }
        (nc, p1, p2)
    }
    println(f"[daily] 5.dedupIncrement mode=$dedupMode corpus=$n docs (new=$nNewDocs) " +
      f"geometry=${bands}x$rows components=$nComps " +
      f"phase2=$p2Secs%.1f s (yesterdayClosure=$p1Secs%.1f s, amortized)")
    println(f"[daily] DAILY-TICK-WALL(dedup)=$p2Secs%.1f s")
    spark.stop()
  }
}
