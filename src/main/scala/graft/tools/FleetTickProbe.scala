package graft.tools

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.SparkSession

import graft.operators.AggregatorRunner
import graft.operators.AggregatorRunner.AggregatorStateStore
import graft.schema.Timeframes
import graft.sources.{HtfLakeWriter, LakeLayout, MinuteLakeReader, MinuteLakeWriter, PartitionLedger}

/** Prices the PRODUCTION deployment shape (VERDICT r15 #3): the full
  * 12-timeframe aggregator fleet (reference `aggregator/config.py:17-21`
  * — 3m 5m 10m 15m 30m 45m 1h 4h 8h 1d 1w 1M) polling one minute lake
  * every 30 s at production width. Prior probes measured one spec at
  * depth (HtfDepthProbe) and one spec at width (HtfWidthProbe /
  * PointRepairProbe); this one measures what a poll actually costs when
  * ALL 12 specs tick against the same lake, per spec and summed.
  *
  * Claims under test:
  *  - STEADY ticks (no new source data) are near-no-ops for every
  *    spec: bounded index reads + monotone watermarks + the
  *    completable-bucket gate keep the per-poll cost independent of
  *    lake depth AND width;
  *  - CALENDAR specs mid-bucket (1w between Mondays, 1M all month) are
  *    driver arithmetic — no Spark job at all between boundaries;
  *  - a BUSY tick (one fresh hour of minutes across the whole width)
  *    costs O(new buckets), dominated by the intraday specs that
  *    actually have completable buckets, while 4h/8h/1d/1w/1M stay
  *    gated at driver-arithmetic cost;
  *  - the fleet poll total fits the 30 s poll interval at width 10k.
  *
  * Lake shape: `width` symbols × `days` full days of minutes starting
  * Monday 2024-12-30T00:00Z (so days ≥ 7 closes at least one 1w
  * bucket; January is never complete, keeping 1M mid-bucket for the
  * whole run — by design: its steady tick IS the claim).
  *
  * Run: `sbt "runMain graft.tools.FleetTickProbe [width] [days] [steadyRounds]"`
  * (defaults 10000, 8, 2).
  */
object FleetTickProbe {

  // Monday — a 1w bucket boundary (ISO week, UTC)
  private val Day1 = Instant.parse("2024-12-30T00:00:00Z")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(10000)
    val days = args.lift(1).flatMap(_.toIntOption).getOrElse(8)
    val steadyRounds = args.lift(2).flatMap(_.toIntOption).getOrElse(2)
    require(days >= 7, "days >= 7 so the 1w spec has a complete bucket")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val specs = Timeframes.supportedNames.map(Timeframes.parse)
    val root = java.nio.file.Files.createTempDirectory("graft-fleet").toString
    val writer = new MinuteLakeWriter(root, new PartitionLedger(s"$root/_state"),
      LakeLayout.DayWide(filesPerDay = 4))
    val reader = new MinuteLakeReader(root)
    val htf = new HtfLakeWriter(s"$root/htf", LakeLayout.DayWide(4))
    val state = new AggregatorStateStore(s"$root/_aggstate")

    val (_, buildSecs) = timed {
      writer.writeDaysWide(HtfDepthProbe.minutesFrame(
        spark, width, Day1, days.toLong * 1440L))
    }
    println(f"[fleet] width=$width days=$days build=$buildSecs%.1f s")

    // one-time backfill per spec (not the per-poll cost; printed for
    // context — the deployment pays it once at daemon start)
    specs.foreach { spec =>
      val (bf, secs) = timed {
        AggregatorRunner.runBackfillAll(spark, reader, htf, state, s"$root/htf", spec)
      }
      println(f"[fleet] backfill tf=${spec.name}%-3s wall=$secs%7.1f s " +
        f"buckets=${bf.bucketsWritten}")
    }

    val ledger = Some(new PartitionLedger(s"$root/_state"))

    def fleetPoll(leg: String): Double = {
      val (results, total) = timed {
        AggregatorRunner.runFleetTick(spark, reader, htf, state,
          s"$root/htf", specs, sourceLedger = ledger)
      }
      results.foreach { case (name, res) =>
        println(f"[fleet] $leg%-12s tf=$name%-3s " +
          f"scanned=${res.bucketsScanned} written=${res.bucketsWritten} " +
          f"repaired=${res.repaired}")
      }
      println(f"[fleet] $leg%-12s POLL TOTAL (12 specs)=$total%.2f s " +
        f"(budget 30 s)")
      total
    }

    // Leg A (the r16 baseline): per-spec loop, NO ledger gate — what a
    // naive deployment pays for a no-news poll. Measured 109–121 s at
    // width 10k (the number that forced the gate).
    var legacyTotal = 0.0
    specs.foreach { spec =>
      val (res, secs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, htf, state,
          s"$root/htf", spec)
      }
      legacyTotal += secs
      println(f"[fleet] legacy-steady tf=${spec.name}%-3s wall=$secs%6.2f s " +
        f"scanned=${res.bucketsScanned} written=${res.bucketsWritten}")
    }
    println(f"[fleet] legacy-steady POLL TOTAL (12 specs)=$legacyTotal%.2f s " +
      f"(budget 30 s)")

    // Leg B: first GATED fleet poll — no stored tokens yet, so every
    // spec runs full, but latest-scan and source read are shared; this
    // prices the worst-case (gate-miss) fleet poll.
    fleetPoll("fleet-first")

    // Leg C: steady gated polls — the ledger is unchanged, every spec
    // token-skips; the poll must be file reads only (no Spark jobs).
    (1 to steadyRounds).foreach(r => fleetPoll(s"fleet-steady#$r"))

    // BUSY fleet poll: one fresh hour of minutes lands across the whole
    // width (the heaviest realistic 30 s poll — normally ~1 new minute),
    // then the fleet ticks once. The data-driven window means 3m..1h
    // aggregate exactly the fresh hour; 4h/8h/1d/1w/1M gate out at
    // driver cost (no bucket they own is completable from one hour).
    val freshStart = Day1.plus(days.toLong, ChronoUnit.DAYS)
    val (_, freshSecs) = timed {
      writer.writeDaysWide(HtfDepthProbe.minutesFrame(spark, width, freshStart, 60L))
    }
    println(f"[fleet] fresh hour landed (width=$width x 60 min) in $freshSecs%.1f s")
    fleetPoll("fleet-busy")

    // post-busy steady poll: tokens re-recorded by the busy tick — back
    // to the skip path
    fleetPoll("fleet-after")

    // REALISTIC cadence: one fresh MINUTE lands across the width (what
    // a 30 s poll actually sees — the fresh-hour leg above is the
    // catch-up shape). The data-driven window bounds every live spec
    // to the new minute; most specs complete no bucket and write 0 —
    // the poll cost is the shared day read + near-empty aggregations.
    val minuteStart = freshStart.plus(1, ChronoUnit.HOURS)
    val (_, minuteSecs) = timed {
      writer.writeDaysWide(
        HtfDepthProbe.minutesFrame(spark, width, minuteStart, 1L), merge = true)
    }
    println(f"[fleet] fresh minute landed (width=$width x 1 min) in $minuteSecs%.1f s")
    fleetPoll("fleet-minute")
    fleetPoll("fleet-minute2") // and back to the skip path

    // CAPPED catch-up (VERDICT r16 #4): land a multi-hour backlog, then
    // drain it with bounded polls (`maxBucketsPerTick`) — every poll
    // must fit the 30 s budget and the carried cursor must converge to
    // the steady skip. The capped deployment keys its own tick state,
    // so its first poll has no stored token — the watermark rescue
    // (window opens at wm+1) still anchors it to the backlog start.
    // Uncapped single-poll drain (the legs above) stays the default.
    val backlogStart = minuteStart.plus(1, ChronoUnit.HOURS)
    val backlogHours = 4L
    val (_, backlogSecs) = timed {
      writer.writeDaysWide(HtfDepthProbe.minutesFrame(
        spark, width, backlogStart, backlogHours * 60L), merge = true)
    }
    println(f"[fleet] backlog landed (width=$width x ${backlogHours * 60} min) " +
      f"in $backlogSecs%.1f s")
    val cap = 20 // per symbol per spec — one hour of 3m buckets per poll
    var polls = 0
    var drained = false
    var cappedWall = 0.0
    val cursorNanos0 = state.cursorWriteNanos
    while (!drained && polls < 20) {
      val (results, total) = timed {
        AggregatorRunner.runFleetTick(spark, reader, htf, state,
          s"$root/htf", specs, sourceLedger = ledger, maxBucketsPerTick = cap)
      }
      polls += 1
      cappedWall += total
      val wrote = results.map(_._2.bucketsWritten).sum
      val scanned = results.map(_._2.bucketsScanned).sum
      drained = wrote == 0 && scanned == 0
      println(f"[fleet] capped#$polls%-2d POLL TOTAL (12 specs)=$total%.2f s " +
        f"scanned=$scanned written=$wrote (cap=$cap/symbol/spec, budget 30 s)")
    }
    println(f"[fleet] capped drain converged in $polls polls " +
      f"(${backlogHours}h backlog)")
    // VERDICT r18 #6: the cursor store rewrites the whole
    // drain_cursors.json block per capped poll — price its wall share
    // before deciding whether per-spec sharding would earn its keep
    val cursorSecs = (state.cursorWriteNanos - cursorNanos0) / 1e9
    println(f"[fleet] cursor-store wall=$cursorSecs%.2f s of " +
      f"$cappedWall%.2f s capped-drain total " +
      f"(${100.0 * cursorSecs / math.max(cappedWall, 1e-9)}%.2f%%)")

    // Budget-derived cap (VERDICT r17 #4): land ANOTHER backlog and let
    // the daemon size the cap itself from a 30 s poll budget — the cap
    // derives from (budget − steady floor) / (width × live-specs ×
    // cost-estimate), and the estimate EWMAs toward each poll's
    // measured wall/scanned, so no hand math. Every capped poll should
    // land around the budget without tuning; convergence is
    // cursor-guaranteed regardless.
    val budget2Start = backlogStart.plus(backlogHours, ChronoUnit.HOURS)
    val (_, backlog2Secs) = timed {
      writer.writeDaysWide(HtfDepthProbe.minutesFrame(
        spark, width, budget2Start, backlogHours * 60L), merge = true)
    }
    println(f"[fleet] second backlog landed in $backlog2Secs%.1f s " +
      "(budget-derived-cap leg)")
    val budgetMs = 30000L
    var bpolls = 0
    var bdrained = false
    while (!bdrained && bpolls < 40) {
      val (results, total) = timed {
        AggregatorRunner.runFleetTick(spark, reader, htf, state,
          s"$root/htf", specs, sourceLedger = ledger, pollBudgetMs = budgetMs)
      }
      bpolls += 1
      val wrote = results.map(_._2.bucketsWritten).sum
      val scanned = results.map(_._2.bucketsScanned).sum
      bdrained = wrote == 0 && scanned == 0
      val est = state.getCostPerBucketMs.getOrElse(-1.0)
      val (mf, mm) = AggregatorRunner.BudgetTelemetry.lastModel
      println(f"[fleet] budget#$bpolls%-2d POLL TOTAL (12 specs)=$total%.2f s " +
        f"scanned=$scanned written=$wrote " +
        f"(budget=${budgetMs / 1000} s, cost-est=$est%.3f ms/bucket, " +
        f"model fixed=${mf / 1000}%.1f s + $mm%.3f ms/bucket, " +
        f"cap=${AggregatorRunner.BudgetTelemetry.lastDerivedCap})")
    }
    println(f"[fleet] budget-capped drain converged in $bpolls polls")

    // FEASIBLE budget leg (VERDICT r18 #2's done criterion): an 8 h
    // backlog drained under a 240 s budget. By now the two-term model
    // is fit from the previous legs' real observations and the sizer
    // predicts from REAL per-symbol backlogs, so every cap-limited
    // poll should land within ±25% of the budget WITHOUT touching the
    // MinBudgetCap floor — the claim the single-term estimate could
    // never deliver (it conflated fixed into marginal and floored
    // near the boundary). 240 s is the smallest round budget above
    // the floor's predicted wall at this width (floor-cap polls cost
    // ~150 s; a 120 s ask is genuinely infeasible and correctly warns).
    val feasibleBacklogHours = 8L
    val budget3Start = budget2Start.plus(backlogHours, ChronoUnit.HOURS)
    val (_, backlog3Secs) = timed {
      writer.writeDaysWide(HtfDepthProbe.minutesFrame(
        spark, width, budget3Start, feasibleBacklogHours * 60L), merge = true)
    }
    println(f"[fleet] third backlog landed in $backlog3Secs%.1f s " +
      "(feasible-budget leg)")
    val feasibleMs = 240000L
    var fpolls = 0
    var fdrained = false
    var inBand = 0
    var floored = 0
    var mid = 0 // polls with backlog both before AND after (cap-sized)
    while (!fdrained && fpolls < 40) {
      val (results, total) = timed {
        AggregatorRunner.runFleetTick(spark, reader, htf, state,
          s"$root/htf", specs, sourceLedger = ledger, pollBudgetMs = feasibleMs)
      }
      fpolls += 1
      val wrote = results.map(_._2.bucketsWritten).sum
      val scanned = results.map(_._2.bucketsScanned).sum
      fdrained = wrote == 0 && scanned == 0
      val capUsed = AggregatorRunner.BudgetTelemetry.lastDerivedCap
      val (mf, mm) = AggregatorRunner.BudgetTelemetry.lastModel
      // band accounting applies to CAP-LIMITED polls only — the final
      // poll drains a remainder smaller than the cap, so its wall is
      // legitimately under-budget
      val capLimited = !fdrained && scanned > 0 &&
        specs.exists(sp =>
          state.getTickState(s"${sp.name}|ai=false|lb=120|budget=$feasibleMs")
            .exists(_.pendingFrom.isDefined))
      if (capLimited) {
        mid += 1
        if (total * 1000 >= feasibleMs * 0.75 && total * 1000 <= feasibleMs * 1.25)
          inBand += 1
        if (capUsed < AggregatorRunner.MinBudgetCap) floored += 1
      }
      println(f"[fleet] feasible#$fpolls%-2d POLL TOTAL (12 specs)=$total%.2f s " +
        f"scanned=$scanned written=$wrote " +
        f"(budget=${feasibleMs / 1000} s, model fixed=${mf / 1000}%.1f s + " +
        f"$mm%.3f ms/bucket, cap=$capUsed, " +
        f"capLimited=$capLimited)")
    }
    println(f"[fleet] feasible-budget drain converged in $fpolls polls; " +
      f"cap-limited polls in ±25%% band: $inBand/$mid, floored: $floored")

    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
