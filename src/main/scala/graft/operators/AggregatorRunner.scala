package graft.operators

import java.time.temporal.ChronoUnit
import java.time.{Instant, ZoneOffset}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ops
import graft.schema.TimeframeSpec
import graft.sources.{HtfLakeWriter, MinuteLakeReader, PartitionLedger,
  PartitionLedgerEntry}

/** Aggregator lifecycle — the backfill / incremental daemons' logic
  * (reference `aggregator/backfill.py:41-121`, `incremental.py:43-104`,
  * `validator.py:17-72`, `main.py:102-137`): idempotent, watermarked,
  * late-arrival-repairing HTF materialization over the minute lake.
  *
  * All bucket detection runs as Spark plans (anti join + completeness
  * agg); only the coalesced repair-window list is collected — windows
  * are small by construction (they shrink to the missing set).
  */
object AggregatorRunner {

  final case class BackfillResult(bucketsScanned: Long, bucketsWritten: Long,
                                  incompleteSkipped: Long, repaired: Long)

  final case class IncrementalResult(bucketsScanned: Long, bucketsWritten: Long,
                                     incompleteSkipped: Long, repaired: Long,
                                     lagMinutes: Option[Long])

  final case class Window(start: Instant, end: Instant)

  /** Per-(symbol, timeframe) aggregator checkpoint (reference
    * `aggregator/state_store.py:35-105`). */
  final class AggregatorStateStore(
      dir: String,
      committer: graft.sources.CommitProtocol = graft.sources.RenameCommit) {
    private val wm = new graft.sources.WatermarkStore(dir, committer)
    def get(symbol: String, timeframe: String): Option[Instant] =
      wm.get(s"$symbol|$timeframe")
    def set(symbol: String, timeframe: String, lastCompleted: Instant): Unit =
      wm.set(s"$symbol|$timeframe", lastCompleted)

    /** All symbols' watermarks for one timeframe in ONE file read —
      * the per-symbol [[get]] re-parses the whole store per call, which
      * a width-10k driver loop turns into O(width²) work. */
    def getAll(timeframe: String): Map[String, Instant] = {
      val suffix = s"|$timeframe".toUpperCase
      wm.read().collect {
        case (k, v) if k.endsWith(suffix) =>
          k.dropRight(suffix.length) -> Instant.parse(v)
      }
    }

    /** Monotone batch advance: ONE read + ONE rewrite for any number of
      * symbols; candidates not ahead of the stored watermark are
      * dropped (repairing an old gap must never move a watermark
      * backward). The only correct call shape for O(symbols) advances. */
    def advanceAll(timeframe: String, candidates: Map[String, Instant]): Unit = {
      val current = getAll(timeframe)
      val ahead = candidates.filter { case (sym, c) =>
        current.get(sym.toUpperCase).forall(_.isBefore(c))
      }
      wm.setAll(ahead.map { case (sym, c) => s"$sym|$timeframe" -> c })
    }

    // -------- per-tick source-change state (the ledger gate) --------
    // One small JSON map keyed by tick identity (timeframe [+symbol]
    // [+config]); value = the minute-lake ledger token the last FULL
    // tick accounted for, its committed-at high-water mark, and the
    // lag that tick reported (returned verbatim on a token skip —
    // data lag is latest-vs-watermark and neither moved). Kept apart
    // from watermarks.json: watermark values are parsed as Instants.
    private val tickFile = java.nio.file.Paths.get(dir, "tick_state.json")
    private def readTicks(): Map[String, String] =
      if (!java.nio.file.Files.exists(tickFile)) Map.empty
      else """"([^"]+)"\s*:\s*"([^"]+)"""".r
        .findAllMatchIn(java.nio.file.Files.readString(tickFile))
        .map(m => m.group(1) -> m.group(2)).toMap

    def getTickState(key: String): Option[TickState] =
      readTicks().get(key).flatMap { v =>
        def inst(s: String): Option[Instant] =
          if (s == "-") None else scala.util.Try(Instant.parse(s)).toOption
        v.split("@", -1) match {
          case Array(tok, hw, ties, lag) => Some(TickState(tok, inst(hw),
            ties.toIntOption.getOrElse(0),
            if (lag == "-") None else lag.toLongOption))
          case Array(tok, hw, ties, lag, pend) => Some(TickState(tok, inst(hw),
            ties.toIntOption.getOrElse(0),
            if (lag == "-") None else lag.toLongOption, inst(pend)))
          case _ => None
        }
      }

    private def writeTicks(updated: Map[String, String]): Unit = {
      val body = updated.toSeq.sorted
        .map { case (k, v) => s"""  "$k": "$v"""" }
        .mkString("{\n", ",\n", "\n}\n")
      committer.putState(tickFile, body.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    }

    def setTickState(key: String, st: TickState): Unit = synchronized {
      writeTicks(readTicks() + (key ->
        s"${st.token}@${st.highWater.map(_.toString).getOrElse("-")}@${
          st.hwTies}@${st.lagMinutes.map(_.toString).getOrElse("-")}@${
          st.pendingFrom.map(_.toString).getOrElse("-")}"))
    }

    // ---- budget-derived cap (VERDICT r17 #4): running per-bucket
    // cost estimate, EWMA'd from each poll's measured wall/scanned so
    // the daemon sizes `maxBucketsPerTick` from a poll budget instead
    // of hand math. One line in the tick file; its value never parses
    // as a TickState, so pre-r18 readers skip it.
    private val CostKey = "__cost_ms_per_bucket"
    def getCostPerBucketMs: Option[Double] =
      readTicks().get(CostKey).flatMap(_.toDoubleOption)
    def setCostPerBucketMs(v: Double): Unit = synchronized {
      // Locale.ROOT, not the f-interpolator: a comma-decimal default
      // locale would write "0,1500", which toDoubleOption can't read —
      // the estimate would silently reset to the seed every poll
      // (r18 advice)
      writeTicks(readTicks() +
        (CostKey -> String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))))
    }

    // ---- two-term cost observations (VERDICT r18 #2) ----
    // Rolling (liveSpecs, scanned, wallMs) triples from budget-driven
    // polls, the data behind the per-spec-fixed + marginal fit:
    // wall ≈ fixed × liveSpecs + marginal × scanned. One line in the
    // tick file ("l:s:w;…"); its value never parses as a TickState,
    // so older readers skip it (and pre-r19 two-field pairs are
    // dropped — tuning state, not durable data).
    private val ObsKey = "__cost_obs"
    def getCostObservations: Seq[(Long, Long, Double)] =
      readTicks().get(ObsKey).toSeq.flatMap(_.split(';').toSeq.flatMap { p =>
        p.split(':') match {
          case Array(l, s, w) =>
            for { lv <- l.toLongOption; sv <- s.toLongOption
                  wv <- w.toDoubleOption }
              yield (lv, sv, wv)
          case _ => None
        }
      })
    def addCostObservation(liveSpecs: Long, scanned: Long,
                           wallMs: Double): Unit =
      synchronized {
        setCostObservations(
          (getCostObservations :+ ((liveSpecs, scanned, wallMs)))
            .takeRight(MaxCostObservations))
      }
    private[graft] def setCostObservations(
        obs: Seq[(Long, Long, Double)]): Unit =
      synchronized {
        writeTicks(readTicks() + (ObsKey -> obs.map { case (l, s, w) =>
          s"$l:$s:${String.format(java.util.Locale.ROOT, "%.1f", Double.box(w))}"
        }.mkString(";")))
      }

    // ---- per-symbol drain cursors (VERDICT r17 #3) ----
    // An in-flight capped drain's resume points, one entry per symbol
    // still pending, keyed "<tickKey>#<SYMBOL>". Same O(width) scale
    // as the watermark file (worst case: every symbol mid-drain);
    // replaced wholesale per capped poll and cleared on convergence.
    // A symbol ABSENT from a tick key's non-empty map is DRAINED —
    // its capped window reached its then-head.
    private val drainFile = java.nio.file.Paths.get(dir, "drain_cursors.json")
    private def readDrain(): Map[String, String] =
      if (!java.nio.file.Files.exists(drainFile)) Map.empty
      else """"([^"]+)"\s*:\s*"([^"]+)"""".r
        .findAllMatchIn(java.nio.file.Files.readString(drainFile))
        .map(m => m.group(1) -> m.group(2)).toMap

    def getDrainCursors(key: String): Map[String, Instant] = {
      val prefix = s"$key#"
      val raw = readDrain().collect {
        case (k, v) if k.startsWith(prefix) => k.drop(prefix.length) -> v
      }
      val parsed = raw.map { case (sym, v) =>
        sym -> scala.util.Try(Instant.parse(v)).toOption }
      // An UNPARSABLE cursor must not be silently dropped: with a
      // non-empty map, an absent symbol is read as DRAINED, so one
      // corrupted entry would make that symbol skip its remaining
      // backlog on pure-resume polls. Discard the WHOLE block for the
      // key instead — the empty map is the pre-r18 legacy shape and
      // every symbol falls back to the global pendingFrom floor
      // (re-scans are write-skipped, so correct; r18 advice).
      if (parsed.exists(_._2.isEmpty)) {
        System.err.println(s"[graft][AggregatorStateStore] unparsable " +
          s"drain cursor under '$key' — discarding the key's cursor " +
          "block; this drain resumes every symbol from the global floor")
        Map.empty
      } else parsed.collect { case (sym, Some(at)) => sym -> at }.toMap
    }

    /** Wall spent inside [[setDrainCursors]] since construction —
      * probe-visible so the capped-drain legs can report the cursor
      * store's share of poll wall (VERDICT r18 #6: price it before
      * deciding whether the per-poll whole-file rewrite needs
      * per-spec sharding). */
    @volatile private[graft] var cursorWriteNanos: Long = 0L

    /** Replace `key`'s whole cursor block with `cursors` (empty map =
      * drain converged: the block is dropped). One read + one atomic
      * rewrite, O(width) — never call per symbol. */
    def setDrainCursors(key: String, cursors: Map[String, Instant]): Unit =
      synchronized {
        val t0 = System.nanoTime()
        try setDrainCursorsInner(key, cursors)
        finally cursorWriteNanos += System.nanoTime() - t0
      }
    private def setDrainCursorsInner(key: String,
                                     cursors: Map[String, Instant]): Unit =
      {
        val prefix = s"$key#"
        val others = readDrain().filterNot(_._1.startsWith(prefix))
        if (cursors.isEmpty && others.isEmpty &&
            !java.nio.file.Files.exists(drainFile)) return // no file churn
        val updated = others ++ cursors.map { case (sym, at) =>
          s"$prefix${sym.toUpperCase}" -> at.toString }
        val body = updated.toSeq.sorted
          .map { case (k, v) => s"""  "$k": "$v"""" }
          .mkString("{\n", ",\n", "\n}\n")
        committer.putState(drainFile, body.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      }
  }

  /** What a completed incremental tick knew about the minute lake:
    * the ledger token it accounted for, the newest commit it saw (plus
    * how many entries carried exactly that stamp — ledger stamps have
    * finite clock resolution, so "newer than the high-water" alone
    * cannot see a later write that tied it to the nanosecond; a grown
    * tie count can), and the lag it reported. */
  final case class TickState(token: String, highWater: Option[Instant],
                             hwTies: Int, lagMinutes: Option[Long],
                             pendingFrom: Option[Instant] = None)

  /** Point-in-time fingerprint of the minute lake's partition ledger —
    * the driver-cheap change detector behind the steady-tick skip
    * (FleetTickProbe r16: a no-news 12-spec fleet poll at width 10k
    * cost 109–121 s of pure re-scan + write-skip; with the gate it is
    * a few file reads). `token` is an md5 over the DEDUPED last-wins
    * entry set, so compacting the append-only ledger file does not
    * change it; `highWater` is the newest parseable `committedAtUtc`.
    * An EMPTY ledger yields no snapshot (callers fall back to the
    * ungated path): a lake written without ledger bookkeeping must
    * never read as "nothing ever changes". */
  final case class SourceSnapshot(token: String, highWater: Option[Instant],
                                  hwTies: Int,
                                  versions: Seq[PartitionLedgerEntry],
                                  droppedThrough: Option[Instant])

  def sourceSnapshot(ledger: PartitionLedger): Option[SourceSnapshot] = {
    // token over the DEDUPED last-wins set (compacting the append-only
    // file must not re-arm gates); change detection over the full
    // VERSION log (two commits to the same key between polls must both
    // contribute their touched ranges — the deduped view keeps only
    // the second)
    val versions = ledger.allVersions()
    if (versions.isEmpty) None
    else {
      val entries = versions.groupBy(e => (e.symbol, e.day, e.hour))
        .values.map(_.last).toSeq
      val md = java.security.MessageDigest.getInstance("MD5")
      entries.sortBy(e => (e.symbol, e.day, e.hour))
        .foreach { e =>
          md.update((s"${e.symbol}|${e.day}|${e.hour}|${e.rowCount}|" +
            s"${e.minTs}|${e.maxTs}|${e.status}|${e.contentHash}\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      val token = md.digest().map("%02x".format(_)).mkString
      // FULL-precision max: a millisecond-truncated ordering picks an
      // arbitrary entry among same-millisecond commits (bulk writers
      // stamp a whole batch within one ms), and a high-water below the
      // true max makes changedSince see the rest of that batch as
      // "changed" — measured as a whole-lake repair window (116M rows)
      // on the first busy tick after a backfill
      val stamps = versions.flatMap(e => parseLedgerTs(e.committedAtUtc))
      val hw = stamps.maxOption(Ordering.by[Instant, (Long, Int)](i =>
        (i.getEpochSecond, i.getNano)))
      Some(SourceSnapshot(token, hw, hw.map(h => stamps.count(_ == h)).getOrElse(0),
        versions, ledger.droppedThrough()))
    }
  }

  /** Ledger timestamps appear in two shapes: ISO instants (r17+ bounds,
    * `committedAtUtc`) and legacy Spark `cast("string")` timestamps
    * (`2026-01-05 00:59:00` — pre-r17 min/max bounds). Both parse
    * through the shared session-TZ-independent helper the writers now
    * render with (ADVICE r16 #1). */
  private def parseLedgerTs(s: String): Option[Instant] =
    graft.sources.LedgerBounds.parse(s)

  /** Where (in event time) the lake changed since `since` — the
    * data-driven replacement for the blind repair lookback. */
  sealed trait ChangeScope
  /** No reliable answer (unparseable rows, or nothing newer than the
    * high-water despite a token change) → blind lookback, no skip. */
  case object ChangeUnknown extends ChangeScope
  /** The token moved but none of the changed entries concern this
    * tick's symbol (single-symbol scope only) → safe skip. */
  case object ChangeNone extends ChangeScope
  /** Everything written since `since` has event time ≥ `lo` — the
    * tick's repair window need not reach further back (and MUST reach
    * this far back, even past the blind lookback: a late write to an
    * old partition is exactly the repair the blind window misses). */
  final case class ChangeFrom(lo: Instant) extends ChangeScope

  def changedSince(snap: SourceSnapshot, since: Instant, sinceTies: Int,
                   symbolFilter: Option[String] = None): ChangeScope = {
    // A compaction that dropped superseded lines stamped AT or after
    // `since` left holes in the change history this tick can't account
    // for — the version-derived window would be too narrow. AT matters
    // (ADVICE r16 #2): a drop stamped exactly at the high-water shrinks
    // the tie set without tripping a strict isAfter guard, silently
    // defeating the same-nanosecond tie-count disambiguation below.
    if (snap.droppedThrough.exists(!_.isBefore(since))) return ChangeUnknown
    // Strictly-newer stamps are changed. Stamps have finite clock
    // resolution, so a later commit CAN tie `since` to the nanosecond;
    // a strict filter alone would silently drop it, while >= would
    // re-include the already-accounted boundary batch every time
    // (defeating ChangeNone and re-widening windows). The recorded
    // tie COUNT disambiguates: more entries at exactly `since` than
    // the last tick saw means unaccounted same-stamp commits — include
    // the whole tie batch (which of them is new is unknowable).
    val tiesNow = snap.versions.filter(e =>
      parseLedgerTs(e.committedAtUtc).contains(since))
    val changed = snap.versions.filter(e =>
      parseLedgerTs(e.committedAtUtc).forall(_.isAfter(since))) ++
      (if (tiesNow.size > sinceTies) tiesNow else Seq.empty)
    if (changed.isEmpty) ChangeUnknown // token moved yet nothing newer: distrust
    else {
      val relevant = symbolFilter match {
        case Some(sym) => changed.filter(e =>
          e.symbol == sym.toUpperCase || e.symbol == "__ALL__" ||
            e.symbol == "__DELTA__")
        case None => changed
      }
      if (relevant.isEmpty) ChangeNone
      else {
        // per-write touched range when the writer recorded it (patch
        // bounds); the partition's content bounds otherwise — wider,
        // never wrong (pre-r16 rows, hourly hour-grain entries)
        val los = relevant.map(e =>
          parseLedgerTs(e.patchMinTs).orElse(parseLedgerTs(e.minTs)))
        if (los.exists(_.isEmpty)) ChangeUnknown // tombstones etc.: blind
        else ChangeFrom(los.flatten.minBy(_.toEpochMilli))
      }
    }
  }

  private def tickKey(spec: TimeframeSpec, allowIncomplete: Boolean,
                      repairLookbackMinutes: Long,
                      symbol: Option[String] = None,
                      maxBucketsPerTick: Int = 0,
                      pollBudgetMs: Long = 0): String =
    s"${spec.name}${symbol.map("#" + _.toUpperCase).getOrElse("")}" +
      s"|ai=$allowIncomplete|lb=$repairLookbackMinutes" +
      // cap joins the key only when set, so existing uncapped
      // deployments keep their recorded tick state across the upgrade.
      // A budget-derived deployment keys by the BUDGET, not the cap it
      // realized this poll (the realized cap moves with the measured
      // per-bucket cost — tokens and cursors must not fragment per poll)
      (if (pollBudgetMs > 0) s"|budget=$pollBudgetMs"
       else if (maxBucketsPerTick > 0) s"|cap=$maxBucketsPerTick" else "")

  /** Monotone watermark advance: repairing an OLD gap must never move a
    * symbol's watermark backward (that would make the next incremental
    * re-scan the lake from the gap to now). */
  private def advanceWatermark(state: AggregatorStateStore, symbol: String,
                               spec: TimeframeSpec, candidate: Instant): Unit =
    state.advanceAll(spec.name, Map(symbol -> candidate))

  /** HTF lake index scan: (bucket_start, bucket_complete) only —
    * columnar parquet makes this a 2-column metadata-light scan. */
  def scanExistingIndex(spark: SparkSession, htfRoot: String,
                        timeframe: String, symbol: String,
                        committer: graft.sources.CommitProtocol =
                          graft.sources.RenameCommit): DataFrame = {
    val dir = s"$htfRoot/timeframe=$timeframe/symbol=${symbol.toUpperCase}"
    val fs = FileSystem.get(new java.net.URI(htfRoot),
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new HPath(dir))) {
      // manifest deployment (r15 #1): the live day versions sit behind
      // each leaf's pointer — resolve before scanning
      if (committer.readThroughResolve) {
        val leaves = graft.sources.ResolvedScan.resolvedLeaves(fs, dir, committer)
        if (leaves.isEmpty)
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("bucket_start",
                org.apache.spark.sql.types.TimestampType),
              org.apache.spark.sql.types.StructField("bucket_complete",
                org.apache.spark.sql.types.BooleanType))))
        return spark.read.option("basePath", dir).parquet(leaves: _*)
          .select("bucket_start", "bucket_complete")
      }
      return spark.read.parquet(dir).select("bucket_start", "bucket_complete")
    }
    // day-wide HTF tree: no per-symbol directory — symbol is a sorted
    // data column under timeframe=T/year=/month=/day= (file-stat pruned)
    val tfDir = s"$htfRoot/timeframe=$timeframe"
    if (graft.sources.LakeLayout.detect(fs, tfDir)
        .exists(_.isInstanceOf[graft.sources.LakeLayout.DayWide]))
      return spark.read.parquet(tfDir)
        .where(col("symbol") === symbol.toUpperCase)
        .select("bucket_start", "bucket_complete")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket_start",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("bucket_complete",
          org.apache.spark.sql.types.BooleanType))))
  }

  /** Window-bounded [[scanExistingIndex]] (r15): everything the
    * incremental tick consults the index FOR — repaired-bucket counting
    * and the freshly-completable watermark advance — concerns buckets
    * inside the tick's repair window, so reading the WHOLE HTF history
    * per tick (O(depth) directory LISTs + an O(history) scan, growing
    * forever) was waste. Descends only the day dirs from `from`
    * forward via `DayDirs.inRange` — 1 + touchedYears + touchedMonths
    * LISTs at any tree depth, same request-economics bound as the
    * minute-lake reads. Rows of `from`'s own day that precede `from`
    * may be included (day granularity); every consumer is insensitive
    * to extras below the window (semi-joins and monotone maxima). */
  def scanExistingIndexFrom(spark: SparkSession, htfRoot: String,
                            timeframe: String, symbol: String,
                            from: Instant,
                            committer: graft.sources.CommitProtocol =
                              graft.sources.RenameCommit): DataFrame = {
    val fs = FileSystem.get(new java.net.URI(htfRoot),
      spark.sparkContext.hadoopConfiguration)
    val farEnd = Instant.parse("9999-01-01T00:00:00Z")
    def empty() = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket_start",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("bucket_complete",
          org.apache.spark.sql.types.BooleanType))))
    val symDir = s"$htfRoot/timeframe=$timeframe/symbol=${symbol.toUpperCase}"
    if (fs.exists(new HPath(symDir))) {
      var days = graft.sources.DayDirs.inRange(fs, symDir, from, farEnd)
      if (committer.readThroughResolve)
        days = graft.sources.ResolvedScan.resolveLeaves(fs, days, committer)
      if (days.isEmpty) empty()
      else spark.read.option("basePath", symDir).parquet(days: _*)
        .select("bucket_start", "bucket_complete")
    } else {
      val tfDir = s"$htfRoot/timeframe=$timeframe"
      if (graft.sources.LakeLayout.detect(fs, tfDir)
          .exists(_.isInstanceOf[graft.sources.LakeLayout.DayWide])) {
        val days = graft.sources.DayDirs.inRange(fs, tfDir, from, farEnd)
        if (days.isEmpty) empty()
        else spark.read.option("basePath", tfDir).parquet(days: _*)
          .where(col("symbol") === symbol.toUpperCase)
          .select("bucket_start", "bucket_complete")
      } else empty()
    }
  }

  /** Rows of `kept` whose content FINGERPRINT differs from the stored
    * row with the same key — the write-skip shared by both incremental
    * paths. md5 of to_json(struct(common columns)): keyed fields and
    * JSON escaping make the encoding unambiguous (a '|'-joined cast
    * collides on values containing the separator), and nulls stay
    * explicit so ("x", null) != (null, "x"). */
  private def changedAgainst(kept: DataFrame, existingFull: DataFrame,
                             keys: Seq[String]): DataFrame = {
    // schema evolution guard (r15 advice): a column present in kept but
    // absent from the stored rows can't be fingerprint-compared — rows
    // differing ONLY in the new column would hash equal and the write
    // would be skipped, so the new column never materializes for the
    // repair window. Treat every kept row as changed until the stored
    // side carries the full schema.
    if (kept.columns.exists(c => !existingFull.columns.contains(c)))
      return kept
    val cmpCols = kept.columns.filter(existingFull.columns.contains).sorted
    def fp(df: DataFrame) = df.withColumn("__fp",
      md5(to_json(struct(cmpCols.map(col): _*),
        Map("ignoreNullFields" -> "false"))))
    // shuffle_hash: the existing side's file-size stats undersell its
    // row count (zstd on repetitive OHLC); a broadcast build of a
    // width-scaled index collects GiBs to the driver (see the fleet
    // path's identical guard)
    fp(kept).join(fp(existingFull).select((keys :+ "__fp").map(col): _*)
        .hint("shuffle_hash"),
        keys :+ "__fp", "left_anti")
      .drop("__fp")
  }

  /** Full-row, window-bounded read of one symbol's stored HTF buckets
    * (the comparison side of [[changedAgainst]]); None when the window
    * holds no stored days. Same explicit day-dir descent as
    * [[scanExistingIndexFrom]]. */
  private def readExistingWindowRows(spark: SparkSession, htfRoot: String,
                                     timeframe: String, symbol: String,
                                     from: Instant,
                                     committer: graft.sources.CommitProtocol =
                                       graft.sources.RenameCommit): Option[DataFrame] = {
    val fs = FileSystem.get(new java.net.URI(htfRoot),
      spark.sparkContext.hadoopConfiguration)
    val farEnd = Instant.parse("9999-01-01T00:00:00Z")
    val symDir = s"$htfRoot/timeframe=$timeframe/symbol=${symbol.toUpperCase}"
    if (fs.exists(new HPath(symDir))) {
      var days = graft.sources.DayDirs.inRange(fs, symDir, from, farEnd)
      if (committer.readThroughResolve)
        days = graft.sources.ResolvedScan.resolveLeaves(fs, days, committer)
      if (days.isEmpty) None
      else Some(spark.read.option("basePath", symDir).parquet(days: _*)
        .drop("year", "month", "day"))
    } else {
      val tfDir = s"$htfRoot/timeframe=$timeframe"
      if (graft.sources.LakeLayout.detect(fs, tfDir)
          .exists(_.isInstanceOf[graft.sources.LakeLayout.DayWide])) {
        val days = graft.sources.DayDirs.inRange(fs, tfDir, from, farEnd)
        if (days.isEmpty) None
        else Some(spark.read.option("basePath", tfDir).parquet(days: _*)
          .where(col("symbol") === symbol.toUpperCase)
          .drop("year", "month", "day"))
      } else None
    }
  }

  /** Complete buckets available in the source minus complete buckets
    * already written (reference `validator.py:17-52`). */
  def detectMissingBuckets(minuteTimestamps: DataFrame, existingIndex: DataFrame,
                           spec: TimeframeSpec): DataFrame = {
    val available = minuteTimestamps
      .withColumn("bucket_start", spec.bucketStart(col("timestamp")))
      .groupBy("bucket_start")
      .agg(count(lit(1)).as("observed"))
      .where(col("observed") === spec.expectedMinutes(col("bucket_start")))
      .select("bucket_start")
    Ops.antiByKeys(available,
      existingIndex.where(col("bucket_complete")), Seq("bucket_start"))
      .orderBy("bucket_start")
  }

  /** Coalesce consecutive missing buckets into contiguous repair windows
    * (gaps-and-islands — reference `validator.py:55-72`). Public utility
    * for window-oriented callers; the backfill itself now bounds its
    * scan with min/max + a distributed semi-join instead. */
  def coalesceBucketWindows(bucketStarts: Seq[Instant], spec: TimeframeSpec): Seq[Window] =
    bucketStarts.sorted(Ordering.by[Instant, Long](_.toEpochMilli))
      .foldLeft(Vector.empty[Window]) { (acc, b) =>
        acc.lastOption match {
          case Some(w) if spec.addBuckets(w.end) == b =>
            acc.init :+ w.copy(end = b)
          case _ => acc :+ Window(b, b)
        }
      }

  /** Startup backfill for one (symbol, timeframe) (reference
    * `backfill.py:41-102`), re-planned for a cluster:
    *
    *  - the missing-bucket set stays a DataFrame end to end — the source
    *    read is bounded to [min(missing), max(missing)] (partition
    *    pruning) and restricted to exactly the missing buckets with a
    *    distributed semi-join, so the driver never materializes
    *    O(buckets) lists (only 3 scalar bounds + 2 metric rows);
    *  - ONE aggregation plan and ONE bulk dynamic-partition-overwrite
    *    write cover the whole backfill, vs a per-window × per-day job
    *    loop that re-ran the aggregation once per day;
    *  - the watermark advances to the last bucket actually WRITTEN
    *    complete — a trailing incomplete (skipped) bucket stays in front
    *    of the watermark so [[runIncremental]] revisits it once its
    *    remaining minutes arrive.
    */
  def runBackfill(spark: SparkSession, reader: MinuteLakeReader,
                  writer: HtfLakeWriter, state: AggregatorStateStore,
                  htfRoot: String, symbol: String, spec: TimeframeSpec,
                  allowIncomplete: Boolean = false): BackfillResult =
    // Re-resolve-on-miss (VERDICT r17 #2): a backfill window/index read
    // under ManifestCommit that outlives the grace window dies on a
    // vanished `.v_*` dir; every read below resolves fresh per call, so
    // re-running the pass re-resolves. The pass is re-run-SAFE as a
    // whole: its writes are the engine's own repair contract — atomic
    // per-partition publishes of recomputed content plus monotone
    // watermark advance — so a retry converges to the identical state
    // (the same property every scheduled re-run of this verb relies on).
    graft.sources.ResolvedScan.retryOnVanishedVersion() {
      runBackfillOnce(spark, reader, writer, state, htfRoot, symbol, spec,
        allowIncomplete)
    }

  private def runBackfillOnce(spark: SparkSession, reader: MinuteLakeReader,
                  writer: HtfLakeWriter, state: AggregatorStateStore,
                  htfRoot: String, symbol: String, spec: TimeframeSpec,
                  allowIncomplete: Boolean): BackfillResult = {
    val existing = scanExistingIndex(spark, htfRoot, spec.name, symbol,
      writer.committer)
    val missing = detectMissingBuckets(
      reader.scanAvailableMinutes(spark, symbol), existing, spec).persist()
    try {
      val bounds = missing
        .agg(count(lit(1)).as("n"), min("bucket_start").as("lo"), max("bucket_start").as("hi"))
        .collect()(0)
      if (bounds.getLong(0) == 0L) return BackfillResult(0, 0, 0, 0)
      val nMissing = bounds.getLong(0)
      val lo = bounds.getTimestamp(1).toInstant
      val hiExclusive = spec.addBuckets(bounds.getTimestamp(2).toInstant)

      val source = reader
        .readWindow(spark, symbol, lo, hiExclusive.minus(1, ChronoUnit.MINUTES))
        .withColumn("__bucket", spec.bucketStart(col("timestamp")))
        .join(missing.withColumnRenamed("bucket_start", "__bucket"),
              Seq("__bucket"), "left_semi")
        .drop("__bucket")
      val aggregated = HtfAggregator.aggregateMinutes(source, spec, symbol).persist()
      try {
        val kept =
          if (allowIncomplete) aggregated
          else aggregated.where(col("bucket_complete"))
        val m = aggregated.agg(
          count(lit(1)).as("total"),
          sum(when(col("bucket_complete"), 1L).otherwise(0L)).as("n_complete"),
          max(when(col("bucket_complete"), col("bucket_start"))).as("last_complete"))
          .collect()(0)
        val total = m.getLong(0)
        val nComplete = if (m.isNullAt(1)) 0L else m.getLong(1)
        val written = if (allowIncomplete) total else nComplete
        val skipped = if (allowIncomplete) 0L else total - nComplete

        // repaired is 0 BY CONSTRUCTION: kept ⊆ missing, and missing was
        // anti-joined against the existing-complete set — backfill only
        // writes buckets the lake didn't have (repairs are incremental's
        // job), so no join is spent computing a constant
        if (written > 0)
          writer.writeBucketsBulk(spark, spec.name, symbol, kept)
        if (!m.isNullAt(2))
          advanceWatermark(state, symbol, spec, m.getTimestamp(2).toInstant)
        BackfillResult(nMissing, written, skipped, repaired = 0)
      } finally aggregated.unpersist()
    } finally missing.unpersist()
  }

  /** Whole-lake startup backfill: EVERY symbol in ONE pipeline —
    * missing (symbol, bucket) detection, a single multi-symbol
    * aggregation (`byCols = symbol`), and one all-symbols
    * dynamic-partition-overwrite write. This is the 1000-symbol plan:
    * the driver never loops symbols; per-symbol watermarks are the only
    * O(symbols) driver state (collected as one small result). */
  def runBackfillAll(spark: SparkSession, reader: MinuteLakeReader,
                     writer: HtfLakeWriter, state: AggregatorStateStore,
                     htfRoot: String, spec: TimeframeSpec,
                     allowIncomplete: Boolean = false): BackfillResult =
    // re-run-safe as a whole — see runBackfill's wrap rationale
    graft.sources.ResolvedScan.retryOnVanishedVersion() {
      runBackfillAllOnce(spark, reader, writer, state, htfRoot, spec,
        allowIncomplete)
    }

  private def runBackfillAllOnce(spark: SparkSession, reader: MinuteLakeReader,
                     writer: HtfLakeWriter, state: AggregatorStateStore,
                     htfRoot: String, spec: TimeframeSpec,
                     allowIncomplete: Boolean): BackfillResult = {
    val minutesOpt = reader.scanAllSymbols(spark)
    if (minutesOpt.isEmpty) return BackfillResult(0, 0, 0, 0)

    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(htfRoot),
      spark.sparkContext.hadoopConfiguration)
    val tfDir = s"$htfRoot/timeframe=${spec.name}"
    val existing =
      if (fs.exists(new HPath(tfDir)) && writer.committer.readThroughResolve) {
        // manifest deployment: per-day versions hide behind pointers
        val leaves = graft.sources.ResolvedScan.resolvedLeaves(
          fs, tfDir, writer.committer)
        if (leaves.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("symbol",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("bucket_start",
                org.apache.spark.sql.types.TimestampType),
              org.apache.spark.sql.types.StructField("bucket_complete",
                org.apache.spark.sql.types.BooleanType))))
        else spark.read.option("basePath", tfDir).parquet(leaves: _*)
          .select("symbol", "bucket_start", "bucket_complete")
      }
      else if (fs.exists(new HPath(tfDir)))
        spark.read.parquet(tfDir).select("symbol", "bucket_start", "bucket_complete")
      else
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("symbol",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("bucket_start",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("bucket_complete",
              org.apache.spark.sql.types.BooleanType))))

    // distinct BEFORE counting — duplicate row versions for one minute
    // must not inflate/deflate the observed-minutes completeness check
    // (mirrors scanAvailableMinutes().distinct() on the per-symbol path)
    val available = minutesOpt.get.select("symbol", "timestamp").distinct()
      .withColumn("bucket_start", spec.bucketStart(col("timestamp")))
      .groupBy("symbol", "bucket_start")
      .agg(count(lit(1)).as("observed"))
      .where(col("observed") === spec.expectedMinutes(col("bucket_start")))
      .select("symbol", "bucket_start")
    val missing = Ops.antiByKeys(available,
      existing.where(col("bucket_complete")), Seq("symbol", "bucket_start")).persist()
    try {
      val bounds = missing
        .agg(count(lit(1)).as("n"), min("bucket_start").as("lo"), max("bucket_start").as("hi"))
        .collect()(0)
      if (bounds.getLong(0) == 0L) return BackfillResult(0, 0, 0, 0)
      val nMissing = bounds.getLong(0)
      val lo = bounds.getTimestamp(1).toInstant
      val hiExclusive = spec.addBuckets(bounds.getTimestamp(2).toInstant)

      val source = reader
        .readWindowAllSymbols(spark, lo, hiExclusive.minus(1, ChronoUnit.MINUTES)).get
        .withColumn("__bucket", spec.bucketStart(col("timestamp")))
        .join(missing.withColumnRenamed("bucket_start", "__bucket"),
              Seq("symbol", "__bucket"), "left_semi")
        .drop("__bucket")
      val aggregated = HtfAggregator
        .aggregateMinutes(source, spec, symbol = "", byCols = Seq("symbol"))
        .persist()
      try {
        val kept =
          if (allowIncomplete) aggregated
          else aggregated.where(col("bucket_complete"))
        val m = aggregated.agg(
          count(lit(1)).as("total"),
          sum(when(col("bucket_complete"), 1L).otherwise(0L)).as("n_complete"))
          .collect()(0)
        val total = m.getLong(0)
        val nComplete = if (m.isNullAt(1)) 0L else m.getLong(1)
        val written = if (allowIncomplete) total else nComplete
        val skipped = if (allowIncomplete) 0L else total - nComplete

        // repaired is 0 by construction (kept ⊆ missing, which excluded
        // every existing-complete bucket) — see runBackfill
        if (written > 0) {
          writer.writeBucketsBulkAllSymbols(spark, spec.name, kept)
          // per-symbol watermarks: one O(symbols) collect, ONE batched
          // monotone store rewrite (per-symbol set() is O(width²))
          state.advanceAll(spec.name,
            aggregated.where(col("bucket_complete"))
              .groupBy("symbol").agg(max("bucket_start").as("wm"))
              .collect()
              .map(r => r.getString(0) -> r.getTimestamp(1).toInstant).toMap)
        }
        BackfillResult(nMissing, written, skipped, repaired = 0)
      } finally aggregated.unpersist()
    } finally missing.unpersist()
  }

  /** Continuous incremental run: recompute from
    * min(next-after-last-completed, now - repair_lookback) so late
    * minutes repair recent buckets idempotently (reference
    * `incremental.py:43-104`; lookback default 120 min,
    * `aggregator/config.py:19`). */
  def runIncremental(spark: SparkSession, reader: MinuteLakeReader,
                     writer: HtfLakeWriter, state: AggregatorStateStore,
                     htfRoot: String, symbol: String, spec: TimeframeSpec,
                     allowIncomplete: Boolean = false,
                     repairLookbackMinutes: Long = 120,
                     sourceLedger: Option[PartitionLedger] = None)
      : IncrementalResult =
    // gated ticks re-resolve on a vanished version (VERDICT r17 #2);
    // re-run-safe as a whole — see runBackfill's wrap rationale (the
    // tick IS the scheduled repair re-run: write-skip + atomic
    // publishes + monotone watermarks make a retry converge)
    graft.sources.ResolvedScan.retryOnVanishedVersion() {
      runIncrementalOnce(spark, reader, writer, state, htfRoot, symbol,
        spec, allowIncomplete, repairLookbackMinutes, sourceLedger)
    }

  private def runIncrementalOnce(spark: SparkSession, reader: MinuteLakeReader,
                     writer: HtfLakeWriter, state: AggregatorStateStore,
                     htfRoot: String, symbol: String, spec: TimeframeSpec,
                     allowIncomplete: Boolean,
                     repairLookbackMinutes: Long,
                     sourceLedger: Option[PartitionLedger])
      : IncrementalResult = {
    // ledger gate + data-driven repair window — see incrementalAllExec
    // for the reasoning. The single-symbol tick additionally skips on
    // ChangeNone: an hourly-layout ledger attributes writes to
    // symbols, so commits that touched only OTHER symbols cannot move
    // this symbol's buckets (wide-layout day writes are "__ALL__" and
    // always relevant).
    val key = tickKey(spec, allowIncomplete, repairLookbackMinutes,
      Some(symbol))
    val snap = sourceLedger.flatMap(sourceSnapshot)
    val stored = if (snap.isDefined) state.getTickState(key) else None
    if (snap.isDefined && stored.exists(_.token == snap.get.token))
      return IncrementalResult(0, 0, 0, 0, stored.get.lagMinutes)
    val scope = for {
      s <- snap; st <- stored; hw <- st.highWater
    } yield changedSince(s, hw, st.hwTies, symbolFilter = Some(symbol))
    if (scope.contains(ChangeNone)) {
      val lag = stored.flatMap(_.lagMinutes)
      snap.foreach(s => state.setTickState(key,
        TickState(s.token, s.highWater, s.hwTies, lag)))
      return IncrementalResult(0, 0, 0, 0, lag)
    }
    val changedFloor: Option[Instant] = scope.flatMap {
      case ChangeFrom(lo) => Some(spec.floorInstant(lo))
      case _ => None
    }
    def recordTick(lag: Option[Long]): Unit = snap.foreach(s =>
      state.setTickState(key, TickState(s.token, s.highWater, s.hwTies, lag)))

    val latestMinuteOpt = reader.latestMinute(spark, symbol)
    if (latestMinuteOpt.isEmpty) return IncrementalResult(0, 0, 0, 0, None)
    val latestMinute = latestMinuteOpt.get

    val repairStart = changedFloor.getOrElse(spec.floorInstant(
      latestMinute.minus(repairLookbackMinutes, ChronoUnit.MINUTES)))
    val wmBefore = state.get(symbol, spec.name)
    val start = wmBefore match {
      case Some(lastCompleted) =>
        val next = spec.addBuckets(lastCompleted)
        if (next.isBefore(repairStart)) next else repairStart
      case None => repairStart
    }

    // Completable-bucket gate (long/calendar frames): when no bucket
    // overlapping [start, latest] can be complete — mid-bucket on a
    // 1d/1w/1M spec, the common case for every tick but the one after
    // a bucket boundary — the aggregation would compute only
    // incomplete buckets and write nothing, so skip the scan entirely.
    // A 1M tick otherwise re-aggregates month-to-date × symbols every
    // poll for zero output. Repairs are unaffected: a window reaching
    // back across the boundary (start ≤ last completable bucket) still
    // aggregates.
    if (!allowIncomplete &&
        spec.latestCompleteBucketStart(latestMinute).forall(_.isBefore(start))) {
      val lag = wmBefore.map { lc =>
        math.max((latestMinute.toEpochMilli - spec.addBuckets(lc).toEpochMilli
          + 60000L) / 60000L, 0L)
      }
      recordTick(lag)
      return IncrementalResult(0, 0, 0, 0, lag)
    }

    // window-bounded index read (see scanExistingIndexFrom): repairs
    // can only touch in-window buckets, so the full-history scan the
    // tick used to pay — O(depth) LISTs + O(history) rows, twice per
    // tick, forever-growing — is bounded to the window's days
    val existing = scanExistingIndexFrom(spark, htfRoot, spec.name, symbol, start,
      writer.committer)
    val source = reader.readWindow(spark, symbol, start, latestMinute)
    val aggregated = HtfAggregator.aggregateMinutes(source, spec, symbol).persist()
    val (scanned, written, skipped, repaired) =
      try {
        val kept =
          if (allowIncomplete) aggregated else aggregated.where(col("bucket_complete"))
        val m = aggregated.agg(
          count(lit(1)).as("total"),
          sum(when(col("bucket_complete"), 1L).otherwise(0L)).as("n_complete"))
          .collect()(0)
        val total = m.getLong(0)
        val nComplete = if (m.isNullAt(1)) 0L else m.getLong(1)
        val nKept = if (allowIncomplete) total else nComplete
        var rep = 0L
        var nWritten = 0L
        if (nKept > 0) {
          // write-skip parity with the fleet path (r15): the repair
          // window re-AGGREGATES every tick (the late-correction
          // contract) but only buckets whose CONTENT differs from the
          // stored row re-WRITE — a steady per-symbol tick otherwise
          // rewrites lookback/bucket partitions per poll forever
          val changed = readExistingWindowRows(spark, htfRoot, spec.name,
              symbol, start, writer.committer) match {
            case None => kept
            case Some(ef) => changedAgainst(kept, ef, Seq("bucket_start"))
          }
          val changedP = changed.persist()
          try {
            nWritten = changedP.count()
            if (nWritten > 0) {
              rep = changedP.join(
                existing.where(col("bucket_complete")).select("bucket_start")
                  .hint("shuffle_hash"),
                Seq("bucket_start"), "left_semi").count()
              writer.writeBucketsBulk(spark, spec.name, symbol, changedP)
            }
          } finally { changedP.unpersist(); () }
        }
        (total, nWritten, if (allowIncomplete) 0L else total - nComplete, rep)
      } finally aggregated.unpersist()

    // watermark advance from the WINDOW's complete buckets, monotone
    // against the stored value — a bounded read cannot see pre-window
    // completes, and the watermark must never regress (re-scanning the
    // lake from an old gap to now would otherwise follow)
    val windowCompleted = scanExistingIndexFrom(spark, htfRoot, spec.name,
        symbol, start, writer.committer)
      .where(col("bucket_complete"))
      .agg(max(col("bucket_start"))).collect().headOption
      .flatMap(r => Option(r.getTimestamp(0))).map(_.toInstant)
    val lastCompleted = (windowCompleted.toSeq ++ wmBefore.toSeq)
      .maxOption(Ordering.by[Instant, Long](_.toEpochMilli))
    lastCompleted.filter(lc => !wmBefore.contains(lc))
      .foreach(state.set(symbol, spec.name, _))

    val lag = lastCompleted.map { lc =>
      val lagMs = latestMinute.toEpochMilli - spec.addBuckets(lc).toEpochMilli + 60000L
      math.max(lagMs / 60000L, 0L)
    }
    recordTick(lag)
    IncrementalResult(scanned, written, skipped, repaired, lag)
  }

  /** Whole-lake incremental run: EVERY symbol's repair window in ONE
    * pipeline. Each symbol's window starts at
    * min(next-after-its-watermark, its-latest-minute − lookback) — the
    * per-symbol bounds are a tiny broadcast frame joined against the
    * lake scan, so the driver never loops symbols; only the per-symbol
    * watermark map (already O(symbols) state) crosses the driver. */
  def runIncrementalAll(spark: SparkSession, reader: MinuteLakeReader,
                        writer: HtfLakeWriter, state: AggregatorStateStore,
                        htfRoot: String, spec: TimeframeSpec,
                        allowIncomplete: Boolean = false,
                        repairLookbackMinutes: Long = 120,
                        sourceLedger: Option[PartitionLedger] = None,
                        maxBucketsPerTick: Int = 0)
      : IncrementalResult =
    incrementalAllExec(spark, reader, writer, state, htfRoot, spec,
      allowIncomplete, repairLookbackMinutes,
      sourceLedger.flatMap(sourceSnapshot), latestOverride = None,
      sourceOverride = None, maxBucketsPerTick = maxBucketsPerTick)

  private def incrementalAllExec(
      spark: SparkSession, reader: MinuteLakeReader,
      writer: HtfLakeWriter, state: AggregatorStateStore,
      htfRoot: String, spec: TimeframeSpec,
      allowIncomplete: Boolean, repairLookbackMinutes: Long,
      snap: Option[SourceSnapshot],
      latestOverride: Option[Map[String, Instant]],
      sourceOverride: Option[DataFrame],
      maxBucketsPerTick: Int = 0,
      pollBudgetMs: Long = 0): IncrementalResult =
    // gated fleet ticks re-resolve on a vanished version (VERDICT r17
    // #2); re-run-safe as a whole — see runBackfill's wrap rationale.
    // A caller-supplied sourceOverride is already eagerly pinned by
    // runFleetTick (see its union-read materialization), so the retry
    // never needs to re-resolve through a stale override plan.
    graft.sources.ResolvedScan.retryOnVanishedVersion() {
      incrementalAllOnce(spark, reader, writer, state, htfRoot, spec,
        allowIncomplete, repairLookbackMinutes, snap, latestOverride,
        sourceOverride, maxBucketsPerTick, pollBudgetMs)
    }

  private def incrementalAllOnce(
      spark: SparkSession, reader: MinuteLakeReader,
      writer: HtfLakeWriter, state: AggregatorStateStore,
      htfRoot: String, spec: TimeframeSpec,
      allowIncomplete: Boolean, repairLookbackMinutes: Long,
      snap: Option[SourceSnapshot],
      latestOverride: Option[Map[String, Instant]],
      sourceOverride: Option[DataFrame],
      maxBucketsPerTick: Int,
      pollBudgetMs: Long = 0): IncrementalResult = {
    import spark.implicits._
    // ---- ledger gate (r16, forced by FleetTickProbe): if the minute
    // lake's partition ledger is bit-identical to what this tick's
    // last FULL run accounted for, re-running would re-aggregate the
    // lookback window across the whole width only to write-skip every
    // row (bucket completeness is data-driven, so an unchanged lake
    // can complete no bucket and move no watermark). Skip at the cost
    // of one small file read, returning the last run's lag (data lag
    // is latest-vs-watermark; neither moved).
    val key = tickKey(spec, allowIncomplete, repairLookbackMinutes,
      maxBucketsPerTick = maxBucketsPerTick, pollBudgetMs = pollBudgetMs)
    val stored = if (snap.isDefined) state.getTickState(key) else None
    // a recorded pendingFrom means the last capped tick drained only
    // part of its window — an unchanged token must NOT skip until the
    // carried remainder is drained (VERDICT r16 #4)
    if (snap.isDefined && stored.exists(st =>
          st.token == snap.get.token && st.pendingFrom.isEmpty))
      return IncrementalResult(0, 0, 0, 0, stored.get.lagMinutes)
    def recordTick(lag: Option[Long], pending: Option[Instant] = None,
                   cursors: Map[String, Instant] = Map.empty): Unit =
      snap.foreach { s =>
        // cursors land BEFORE the tick state: a crash between the two
        // putStates must never leave a visible pendingFrom without its
        // cursor map (the reverse — a stale cursor file under a
        // cleared/absent pendingFrom — is ignored by construction)
        state.setDrainCursors(key, if (pending.isEmpty) Map.empty else cursors)
        state.setTickState(key,
          TickState(s.token, s.highWater, s.hwTies, lag, pending))
      }
    // Data-driven repair window (r16): the blind lookback exists to
    // catch late minutes landing behind the watermark — but the ledger
    // KNOWS where writes landed since the last tick. When every commit
    // since the stored high-water parses, the repair window starts at
    // the oldest changed event time instead of now−lookback: a fresh-
    // data-only tick stops re-aggregating untouched history, and a
    // late write to an old partition extends the window BACK past the
    // blind lookback (the repair it would have missed).
    val changedFloor: Option[Instant] = (for {
      s <- snap; st <- stored; hw <- st.highWater
    } yield changedSince(s, hw, st.hwTies)).flatMap {
      case ChangeFrom(lo) => Some(spec.floorInstant(lo))
      case _ => None // ChangeUnknown/ChangeNone: blind lookback
    }
    // ONE store read for all symbols (per-symbol get() re-parses the
    // whole watermark file per call — O(width²) at width 10k)
    val wmAll = state.getAll(spec.name)
    // per-symbol latest via partition-directory descent (reads ONE hour
    // partition per symbol, not the lake's history — the steady-state
    // tick must not scale with lake depth). Watermarked symbols absent
    // from the wide layout's recent-day scan (idle > 2 days) are
    // end-probed so their trailing buckets still finalize (ADVICE r13).
    val latest = latestOverride.getOrElse(
      reader.latestMinuteAllSymbols(spark, wmAll.keySet))
    if (latest.isEmpty) return IncrementalResult(0, 0, 0, 0, None)
    // carried drain cursor: a previous capped tick stopped here — this
    // tick's windows must pick up at it. On a PURE resume (unchanged
    // token) the cursor IS the start: nothing landed since the cursor's
    // tick accounted the whole backlog, so re-opening the blind
    // lookback or the watermark rescue would re-scan ground the cursor
    // already drained, and the cursor would never advance. When the
    // token moved too, the window floor is the EARLIER of the cursor
    // and the ledger-derived floor (old backlog ∪ new writes).
    val resumeFloor = stored.flatMap(_.pendingFrom).map(spec.floorInstant)
    val pureResume = resumeFloor.isDefined &&
      snap.exists(s => stored.exists(_.token == s.token))
    // Per-symbol drain cursors (VERDICT r17 #3): the tick state's
    // pendingFrom is the fleet-wide MIN of un-drained starts, and
    // resuming EVERY symbol there re-scanned already-drained symbols
    // on each capped poll (write-skipped, so correct — but the
    // scan/aggregate cost recurred and skewed backlogs drained in more
    // polls than needed). The cursor STORE carries each pending
    // symbol's own first un-drained bucket start; a symbol ABSENT from
    // a non-empty map is drained — its capped window reached its
    // then-head, and a pure resume (unchanged token) means nothing
    // landed since, so it scans nothing. An EMPTY map under a recorded
    // pendingFrom is a pre-r18 in-flight drain: every symbol falls
    // back to the global floor (the legacy shape).
    val drainCursors: Map[String, Instant] =
      if (resumeFloor.isDefined) state.getDrainCursors(key) else Map.empty
    val boundsSeq = latest.toSeq.map { case (sym, latestMinute) =>
      val cursor = drainCursors.get(sym.toUpperCase)
      val start =
        if (pureResume)
          cursor.getOrElse(
            if (drainCursors.nonEmpty)
              // drained symbol: first bucket past its head — an empty
              // window (its latest cannot reach it)
              spec.addBuckets(spec.floorInstant(latestMinute))
            else resumeFloor.get)
        else {
          val repairStart0 = changedFloor.getOrElse(spec.floorInstant(
            latestMinute.minus(repairLookbackMinutes, ChronoUnit.MINUTES)))
          // token moved mid-drain: the floor is the EARLIER of this
          // symbol's own backlog cursor and the ledger-derived repair
          // floor (old backlog ∪ new writes); a drained symbol (absent
          // from a non-empty map) has only the new writes to cover
          val drainFloor =
            cursor.orElse(if (drainCursors.nonEmpty) None else resumeFloor)
          val repairStart =
            drainFloor.filter(_.isBefore(repairStart0)).getOrElse(repairStart0)
          wmAll.get(sym.toUpperCase) match {
            case Some(lastCompleted) =>
              val next = spec.addBuckets(lastCompleted)
              if (next.isBefore(repairStart)) next else repairStart
            case None => repairStart
          }
        }
      (sym, start, latestMinute)
    }
    // Bounded drain (VERDICT r16 #4): cap each symbol's window at
    // `maxBucketsPerTick` buckets and carry the first un-drained
    // bucket start forward as the next tick's cursor. A cold daemon
    // behind a day of backlog then drains in budget-bounded polls
    // (each ≤ cap buckets × width) instead of one 25-minute poll;
    // cap = 0 keeps the uncapped single-poll drain.
    val (drainBounds, pendingNext, nextCursors) =
      if (maxBucketsPerTick <= 0)
        (boundsSeq, None, Map.empty[String, Instant])
      else {
        val capped = boundsSeq.map { case (sym, start, lm) =>
          val capEnd = spec.addBuckets(start, maxBucketsPerTick)
            .minus(1, ChronoUnit.MINUTES) // last minute of bucket cap-1
          if (capEnd.isBefore(lm)) ((sym, start, capEnd), Some(spec.addBuckets(start, maxBucketsPerTick)))
          else ((sym, start, lm), None)
        }
        (capped.map(_._1),
          capped.flatMap(_._2).minByOption(_.toEpochMilli),
          // per-symbol resume points: pending symbols only — drained
          // symbols leave the map, which IS their drained signal
          capped.collect { case ((sym, _, _), Some(next)) =>
            sym.toUpperCase -> next }.toMap)
      }
    // Completable-bucket gate, fleet-wide (see runIncremental): if NO
    // symbol's window can contain a complete bucket, the whole tick's
    // scan+aggregation would produce zero writable rows — skip it. The
    // check is O(symbols) driver arithmetic on the bounds already in
    // hand.
    if (!allowIncomplete && drainBounds.forall { case (_, start, lm) =>
          spec.latestCompleteBucketStart(lm).forall(_.isBefore(start)) }) {
      val perSymbolLag = boundsSeq.map { case (sym, _, lm) =>
        wmAll.get(sym.toUpperCase).map { lc =>
          math.max((lm.toEpochMilli - spec.addBuckets(lc).toEpochMilli
            + 60000L) / 60000L, 0L)
        }
      }
      val lag =
        if (perSymbolLag.exists(_.isEmpty)) None
        else perSymbolLag.flatten.maxOption
      // the gate-skip is a COMPLETE account of this lake state for
      // this tick: nothing completable exists, so nothing ever will
      // until the ledger moves — record the token so the next poll
      // skips at file-read cost instead of re-deriving the gate
      // (with the drain cursor preserved if a cap truncated us here)
      recordTick(lag, pendingNext, nextCursors)
      return IncrementalResult(0, 0, 0, 0, lag)
    }
    val bounds = drainBounds
      .map { case (s, st, lt) =>
        (s, java.sql.Timestamp.from(st), java.sql.Timestamp.from(lt)) }
      .toDF("symbol", "__start", "__latest")

    // global bounds come from the driver-local seq — no Spark job needed
    val globalLo = drainBounds.map(_._2).minBy(_.toEpochMilli)
    val globalHi = drainBounds.map(_._3).maxBy(_.toEpochMilli)
    val source = sourceOverride
      .getOrElse(reader.readWindowAllSymbols(spark, globalLo, globalHi).get)
      .join(broadcast(bounds), Seq("symbol"))
      .where(col("timestamp").between(col("__start"), col("__latest")))
      .drop("__start", "__latest")

    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(htfRoot),
      spark.sparkContext.hadoopConfiguration)
    val tfDir = s"$htfRoot/timeframe=${spec.name}"
    val farEnd = Instant.parse("9999-01-01T00:00:00Z")
    val loBound = spec.floorInstant(globalLo)
    // wide HTF tree: every index consumer below is window-bounded
    // (repaired-count semi-join, fingerprint compare), so read ONLY the
    // window's day dirs — explicit descent, never a root read + a
    // partition predicate, which lists every file in the tree before
    // pruning and scans history that grows forever (r15; the hourly
    // layout keeps the plain read — it is the ≤1000-width regime and
    // its tree is per-symbol). An empty day set reads as an empty frame.
    val wideTf = graft.sources.LakeLayout.detect(fs, tfDir)
      .exists(_.isInstanceOf[graft.sources.LakeLayout.DayWide])
    lazy val windowDays =
      graft.sources.DayDirs.inRange(fs, tfDir, loBound, farEnd)
    // hourly tree under a manifest deployment: window-bound each
    // symbol's day walk, then resolve each leaf through the pointer
    lazy val hourlyResolvedWindowLeaves: Seq[String] = {
      val windowLeafDirs = fs.listStatus(new HPath(tfDir)).iterator
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("symbol="))
        .flatMap(st => graft.sources.DayDirs.inRange(fs, st.getPath.toString,
          loBound, farEnd))
        .toSeq
      graft.sources.ResolvedScan.resolveLeaves(fs, windowLeafDirs,
        writer.committer)
    }
    val mustResolve = writer.committer.readThroughResolve

    val aggregated = HtfAggregator
      .aggregateMinutes(source, spec, symbol = "", byCols = Seq("symbol"))
      .persist()
    try {
      val kept =
        if (allowIncomplete) aggregated else aggregated.where(col("bucket_complete"))
      // ONE action over the persisted aggregation serves BOTH the
      // global counters and the per-symbol complete-bucket watermarks
      // advanceAll needs below (r20): the busy tick previously paid a
      // second full stage over the cached frame for the watermark
      // collect — at width 10k that is a second 10k-group aggregation
      // per spec per poll. The collect is width-bounded (one row per
      // symbol), the same bound advanceAll's collect already had.
      val perSym = aggregated.groupBy("symbol").agg(
        count(lit(1)).as("n"),
        sum(when(col("bucket_complete"), 1L).otherwise(0L)).as("nc"),
        max(when(col("bucket_complete"), col("bucket_start"))).as("wm"))
        .collect()
      val total = perSym.map(_.getLong(1)).sum
      val nComplete = perSym.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum
      val nKept = if (allowIncomplete) total else nComplete
      var repaired = 0L
      var nWritten = 0L
      if (nKept > 0) {
        // steady-state write-skip: the repair window re-AGGREGATES every
        // tick (that is the late-correction contract), but only buckets
        // whose CONTENT differs from the stored row are re-WRITTEN. A
        // no-news tick over a 1000-symbol lake otherwise rewrites
        // lookback/bucket buckets per symbol per cadence — measured
        // 3000 bucket writes per no-op tick at width 1000 (HtfWidthProbe).
        // Fingerprint = md5 of to_json(struct(cmpCols)): keyed fields and
        // JSON escaping make the encoding unambiguous (a '|'-joined cast
        // collides on values containing the separator), and nulls stay
        // explicit so ("x", null) != (null, "x").
        val tfDirPath = new HPath(tfDir)
        // `__complete_old` rides the fingerprint join (r20): the repaired
        // count used to be a SECOND action — a semi-join of the changed
        // rows against a separate window read of the existing index —
        // paid on every writing poll. The HTF tree is keyed-unique on
        // (symbol, bucket_start) by construction (every writer path
        // merges keyed last-wins), so a left join carries the existing
        // row's completeness through the same shuffle the write-skip
        // compare already pays, and one aggregate action below yields
        // nWritten AND repaired together.
        val changed =
          if (!fs.exists(tfDirPath) || (wideTf && windowDays.isEmpty) ||
              (mustResolve && !wideTf && hourlyResolvedWindowLeaves.isEmpty))
            kept.withColumn("__complete_old", lit(null).cast("boolean"))
          else {
            // bound the comparison read to the lookback window. Wide
            // tree: explicit window day dirs (a
            // root read + partition predicate would still LIST every
            // file in the tree first). Hourly tree: the year/month/day
            // PARTITION-column predicate (lpad-normalized, robust to
            // int-inferred values) scan-prunes to the lookback days —
            // a data-column-only filter on bucket_start would walk the
            // whole table history on every tick.
            val lo = spec.floorInstant(globalLo)
            val existingFull =
              if (wideTf)
                spark.read.option("basePath", tfDir).parquet(windowDays: _*)
                  .drop("year", "month", "day")
                  .where(col("bucket_start") >= java.sql.Timestamp.from(lo))
              else if (mustResolve)
                spark.read.option("basePath", tfDir)
                  .parquet(hourlyResolvedWindowLeaves: _*)
                  .drop("year", "month", "day")
                  .where(col("bucket_start") >= java.sql.Timestamp.from(lo))
              else {
                val dayKey = concat(
                  lpad(col("year").cast("string"), 4, "0"),
                  lpad(col("month").cast("string"), 2, "0"),
                  lpad(col("day").cast("string"), 2, "0"))
                val loDay = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
                  .withZone(java.time.ZoneOffset.UTC).format(lo)
                spark.read.parquet(tfDir)
                  .where(dayKey >= loDay)
                  .drop("year", "month", "day")
                  .where(col("bucket_start") >= java.sql.Timestamp.from(lo))
              }
            val cmpCols = kept.columns.filter(existingFull.columns.contains).sorted
            def fp(df: org.apache.spark.sql.DataFrame) = df.withColumn("__fp",
              md5(to_json(struct(cmpCols.map(col): _*),
                Map("ignoreNullFields" -> "false"))))
            // shuffle_hash, NEVER broadcast: the existing side is
            // window-buckets × width — at width 10k one HTF day is
            // 4.8M rows behind a single-digit-MiB zstd footprint, so
            // file-size stats sell it as broadcastable and the build
            // collects GiBs to the driver (measured: maxResultSize
            // abort on the first busy fleet tick). A per-partition
            // hash build is bounded at any width; when the side is
            // genuinely small the extra exchange costs milliseconds
            val joined = fp(kept).join(
                fp(existingFull)
                  .select(col("symbol"), col("bucket_start"),
                    col("__fp").as("__fp_old"),
                    col("bucket_complete").as("__complete_old"))
                  .hint("shuffle_hash"),
                Seq("symbol", "bucket_start"), "left")
            // same schema-evolution guard as changedAgainst: a
            // kept-only column means fingerprints can't see the
            // difference — rewrite the window rather than skip it
            val guard = kept.columns.exists(c => !existingFull.columns.contains(c))
            (if (guard) joined
             else joined.where(col("__fp_old").isNull ||
                               col("__fp_old") =!= col("__fp")))
              .drop("__fp", "__fp_old")
          }
        val changedPersisted = changed.persist()
        try {
          // ONE action: changed count + repaired count (changed rows
          // whose superseded stored row was complete) + the touched-day
          // set the bulk writer would otherwise re-derive with its own
          // distinct pass (r20); day derivation matches the writer's
          // date_format partition columns (both session-TZ)
          val cnt = changedPersisted.agg(
            count(lit(1)).as("n"),
            count(when(col("__complete_old"), lit(1))).as("rep"),
            collect_set(struct(
              year(col("bucket_start")).as("y"),
              month(col("bucket_start")).as("m"),
              dayofmonth(col("bucket_start")).as("d"))).as("days")).collect()(0)
          nWritten = cnt.getLong(0)
          if (nWritten > 0) {
            repaired = cnt.getLong(1)
            val days = cnt.getSeq[org.apache.spark.sql.Row](2)
              .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
            writer.writeBucketsBulkAllSymbols(spark, spec.name,
              changedPersisted.drop("__complete_old"), touchedDays = Some(days))
          }
        } finally { changedPersisted.unpersist(); () }
        // watermarks advance on every observed-complete bucket, written
        // or skipped-as-unchanged — both mean the bucket is current;
        // one batched monotone rewrite, not a per-symbol loop. The map
        // derives from the perSym pass above — no extra Spark action.
        state.advanceAll(spec.name,
          perSym.iterator
            .filter(!_.isNullAt(3))
            .map(r => r.getString(0) -> r.getTimestamp(3).toInstant).toMap)
      }
      // lag = worst symbol's distance from its own latest minute; a
      // symbol with minutes but NO completed bucket yet has unbounded
      // lag, so the fleet metric is unknown (None), not a healthy number
      // computed only from caught-up symbols
      val wmAfter = state.getAll(spec.name)
      val perSymbolLag = latest.toSeq.map { case (sym, lm) =>
        wmAfter.get(sym.toUpperCase).map { lc =>
          math.max((lm.toEpochMilli - spec.addBuckets(lc).toEpochMilli + 60000L)
            / 60000L, 0L)
        }
      }
      val lag =
        if (perSymbolLag.exists(_.isEmpty)) None
        else perSymbolLag.flatten.maxOption
      recordTick(lag, pendingNext, nextCursors)
      IncrementalResult(total, nWritten,
        if (allowIncomplete) 0L else total - nComplete, repaired, lag)
    } finally aggregated.unpersist()
  }

  /** One fleet poll: EVERY timeframe spec ticks against the same
    * minute lake, sharing what is shareable (the production deployment
    * shape — reference `aggregator/config.py:17-21` runs 12 specs on a
    * 30 s poll). Per spec this is exactly [[runIncrementalAll]]'s
    * semantics; across specs it shares three costs the per-spec loop
    * pays `specs.size` times over:
    *
    *  1. ONE ledger snapshot decides every spec's token skip — a
    *     no-news poll is `specs.size` file reads, zero Spark jobs
    *     (FleetTickProbe r16 measured the ungated loop at 109–121 s
    *     per steady poll at width 10k × 12 specs vs a 30 s budget);
    *  2. ONE `latestMinuteAllSymbols` scan serves every non-skipped
    *     spec (the per-spec loop re-derives the identical map);
    *  3. ONE minute-lake read over the UNION of the live specs'
    *     repair windows, persisted and re-filtered per spec (the
    *     per-spec loop re-reads overlapping windows from parquet).
    *
    * Returns results in `specs` order. */
  def runFleetTick(spark: SparkSession, reader: MinuteLakeReader,
                   writer: HtfLakeWriter, state: AggregatorStateStore,
                   htfRoot: String, specs: Seq[TimeframeSpec],
                   sourceLedger: Option[PartitionLedger] = None,
                   allowIncomplete: Boolean = false,
                   repairLookbackMinutes: Long = 120,
                   maxBucketsPerTick: Int = 0,
                   pollBudgetMs: Long = 0)
      : Seq[(String, IncrementalResult)] = {
    val t0 = System.nanoTime()
    // an explicit cap wins over a budget (the budget exists to replace
    // hand-tuned caps, not to second-guess one the deployment chose)
    val effBudget = if (maxBucketsPerTick > 0) 0L else pollBudgetMs
    val snap = sourceLedger.flatMap(sourceSnapshot)
    val storedBy = specs.map { sp =>
      sp.name -> (if (snap.isDefined)
        state.getTickState(tickKey(sp, allowIncomplete, repairLookbackMinutes,
          maxBucketsPerTick = maxBucketsPerTick, pollBudgetMs = effBudget))
      else None)
    }.toMap
    // a spec with a carried drain cursor stays live on an unchanged
    // token — its capped predecessor left backlog behind (r16 #4)
    val live = specs.filterNot(sp =>
      snap.isDefined && storedBy(sp.name).exists(st =>
        st.token == snap.get.token && st.pendingFrom.isEmpty))
    if (live.isEmpty)
      return specs.map(sp => sp.name ->
        IncrementalResult(0, 0, 0, 0, storedBy(sp.name).flatMap(_.lagMinutes)))

    // shared latest: union of the live specs' watermark key sets, so
    // every spec's end-probe reconciliation set is covered
    val wmKeys = live.flatMap(sp => state.getAll(sp.name).keySet).toSet
    val latest = reader.latestMinuteAllSymbols(spark, wmKeys)
    val latestFor = if (latest.isEmpty) None else Some(latest)

    // Pre-pass: every live spec's UNCAPPED per-symbol windows. Window
    // lo per symbol = its changed-floor (or blind lookback, or its
    // carried drain cursor) — the same math the per-spec core applies;
    // hi = the symbol's latest minute. Computed BEFORE the cap so the
    // budget sizer sees the REAL per-symbol backlogs (r19: the
    // cap × width × live-specs volume estimate overstates scan cost by
    // the deep-to-shallow backlog ratio — a 1h spec has 20× fewer
    // pending buckets than 3m over the same lag). Gating here uses the
    // uncapped end, which is equivalent: starts are bucket-aligned, so
    // a capped window of ≥1 whole bucket completes a bucket iff the
    // uncapped one does. Gated specs drop out — they launch no scan,
    // pay no cap, and must not drag the union read backward.
    val specWindows: Seq[(graft.schema.TimeframeSpec,
                          Seq[(String, Instant, Instant)])] =
      if (latest.isEmpty) Nil
      else live.flatMap { sp =>
        val wmAll = state.getAll(sp.name)
        val cf = (for {
          s <- snap; st <- storedBy(sp.name); hw <- st.highWater
        } yield changedSince(s, hw, st.hwTies)).flatMap {
          case ChangeFrom(lo) => Some(sp.floorInstant(lo))
          case _ => None
        }
        val resume = storedBy(sp.name).flatMap(_.pendingFrom).map(sp.floorInstant)
        val pureResume = resume.isDefined &&
          snap.exists(s => storedBy(sp.name).exists(_.token == s.token))
        // per-symbol drain cursors (VERDICT r17 #3) — the union bound
        // must not drag every symbol's window back to the fleet-wide
        // cursor; same resume semantics as the per-spec core
        val drainCursors: Map[String, Instant] =
          if (resume.isDefined)
            state.getDrainCursors(tickKey(sp, allowIncomplete,
              repairLookbackMinutes, maxBucketsPerTick = maxBucketsPerTick,
              pollBudgetMs = effBudget))
          else Map.empty
        val spans = latest.toSeq.map { case (sym, latestMinute) =>
          val cursor = drainCursors.get(sym.toUpperCase)
          val start = if (pureResume)
            cursor.getOrElse(
              if (drainCursors.nonEmpty)
                sp.addBuckets(sp.floorInstant(latestMinute)) // drained
              else resume.get)
          else {
            val repairStart0 = cf.getOrElse(sp.floorInstant(
              latestMinute.minus(repairLookbackMinutes, ChronoUnit.MINUTES)))
            val drainFloor =
              cursor.orElse(if (drainCursors.nonEmpty) None else resume)
            val repairStart =
              drainFloor.filter(_.isBefore(repairStart0)).getOrElse(repairStart0)
            wmAll.get(sym.toUpperCase) match {
              case Some(lastCompleted) =>
                val next = sp.addBuckets(lastCompleted)
                if (next.isBefore(repairStart)) next else repairStart
              case None => repairStart
            }
          }
          (sym, start, latestMinute)
        }
        val gated = !allowIncomplete && spans.forall {
          case (_, start, lmEnd) =>
            sp.latestCompleteBucketStart(lmEnd).forall(_.isBefore(start))
        }
        if (gated) None else Some(sp -> spans)
      }

    // Budget-derived cap (VERDICT r17 #4; two-term + backlog-aware
    // since r19): with a fitted model (wall ≈ fixed × scanning-specs +
    // marginal × scanned — see fitCostModel), the cap is the largest c
    // whose PREDICTED wall fits the budget, where predicted scan
    // volume is Σ_spec Σ_sym min(c, backlog) over the pre-pass's real
    // windows — not cap × width × live-specs, which overstates volume
    // whenever spec backlogs are shallower than the cap and made the
    // r19 probe's first feasible-budget leg land every poll far under
    // budget. Before the model exists (cold start, <2 non-collinear
    // observations) the r18 seeded closed form applies unchanged, so
    // explicitly-seeded deployments derive the same first cap. FLOOR
    // at the r17-validated amortization cap either way: below ~20
    // buckets/symbol/poll fixed costs dominate and every poll gets
    // SLOWER per unit of progress; an infeasible budget is reported
    // loudly WITH the measured minimum feasible budget.
    val effCap =
      if (effBudget <= 0) maxBucketsPerTick
      else fitCostModel(state.getCostObservations) match {
        case Some((fSpec, mMs)) =>
          val backlogs: Seq[Array[Long]] = specWindows.map { case (sp, spans) =>
            spans.map { case (_, start, lmEnd) =>
              bucketsSpanned(sp, start, lmEnd) }.toArray
          }
          val nScanning = math.max(specWindows.size, 1)
          def predicted(c: Long): Double =
            fSpec * nScanning + mMs * backlogs.iterator.map(arr =>
              arr.iterator.map(b => math.min(b, c)).sum).sum
          val maxBacklog = backlogs.iterator.flatMap(_.iterator)
            .foldLeft(MinBudgetCap.toLong)(math.max)
          BudgetTelemetry.lastModel = (fSpec, mMs)
          if (predicted(MinBudgetCap.toLong) > effBudget) {
            BudgetTelemetry.lastDerivedCap = 0 // sub-floor: infeasible
            System.err.println(s"[graft][AggregatorRunner] poll budget " +
              s"${effBudget} ms is infeasible at width=${latest.size} x " +
              s"scanning-specs=$nScanning (model fixed=${fSpec.toLong} " +
              "ms/spec + " +
              String.format(java.util.Locale.ROOT, "%.3f", Double.box(mMs)) +
              s" ms/bucket): measured minimum feasible budget is " +
              s"~${predicted(MinBudgetCap.toLong).toLong} ms; raise the " +
              "budget, shrink the spec set, or accept floor-cap drains")
            MinBudgetCap
          } else {
            var lo = MinBudgetCap.toLong
            var hi = maxBacklog
            while (lo < hi) {
              val mid = (lo + hi + 1) / 2
              if (predicted(mid) <= effBudget) lo = mid else hi = mid - 1
            }
            BudgetTelemetry.lastDerivedCap = lo.toInt
            lo.toInt
          }
        case None =>
          // cold start: the r18 seeded closed form
          val width = math.max(latest.size, 1)
          val margMs = state.getCostPerBucketMs.getOrElse(DefaultBucketCostMs)
          val denom = margMs * width.toDouble * math.max(live.size, 1)
          val derived = ((effBudget.toDouble - SteadyFloorMs) / denom).toInt
          BudgetTelemetry.lastModel = (SteadyFloorMs.toDouble, margMs)
          BudgetTelemetry.lastDerivedCap = derived
          if (derived < MinBudgetCap) {
            val minFeasibleMs = (SteadyFloorMs + denom * MinBudgetCap).toLong
            System.err.println(s"[graft][AggregatorRunner] poll budget " +
              s"${effBudget} ms is infeasible at width=$width x " +
              s"live-specs=${live.size} (derived cap $derived < floor " +
              s"$MinBudgetCap at seeded " +
              String.format(java.util.Locale.ROOT, "%.3f", Double.box(margMs)) +
              s" ms/bucket): measured minimum feasible budget is " +
              s"~$minFeasibleMs ms; raise the budget, shrink the spec " +
              "set, or accept floor-cap drains")
          }
          math.max(MinBudgetCap, derived)
      }

    // shared source: the union of live windows — the pre-pass spans
    // with each end capped at effCap buckets; the per-spec core
    // re-narrows via its bounds join.
    val shared: Option[DataFrame] = latestFor.flatMap { _ =>
      val bounds = specWindows.map { case (sp, spans) =>
        val capped = spans.map { case (_, start, lmEnd) =>
          val end =
            if (effCap <= 0) lmEnd
            else {
              val capEnd = sp.addBuckets(start, effCap)
                .minus(1, ChronoUnit.MINUTES)
              if (capEnd.isBefore(lmEnd)) capEnd else lmEnd
            }
          (start, end)
        }
        (capped.map(_._1).minBy(_.toEpochMilli),
          capped.map(_._2).maxBy(_.toEpochMilli))
      }
      for {
        unionLo <- bounds.map(_._1).minByOption(_.toEpochMilli)
        unionHi <- bounds.map(_._2).maxByOption(_.toEpochMilli)
      } yield {
        if (!writer.committer.readThroughResolve)
          // identity deployments: paths never vanish; keep the lazy
          // persist (the first spec's tick materializes the cache)
          reader.readWindowAllSymbols(spark, unionLo, unionHi).get.persist()
        else
          // manifest deployments (VERDICT r17 #2): the shared union
          // plan has resolved `.v_*` paths baked in and is consumed by
          // EVERY spec's tick — a version GC'd after the first tick
          // materialized part of the cache would die inside a later
          // tick, whose own retry cannot re-resolve a caller-owned
          // plan. Materialize the cache eagerly INSIDE the retry (the
          // same single parquet pass the first tick would have paid);
          // later ticks read only the pinned cache.
          graft.sources.ResolvedScan.retryOnVanishedVersion() {
            val df = reader.readWindowAllSymbols(spark, unionLo, unionHi)
              .get.persist()
            try { df.count(); df }
            catch { case e: Throwable => df.unpersist(); throw e }
          }
      }
    }
    try {
      val results = specs.map { sp =>
        sp.name -> (
          if (live.exists(_.name == sp.name))
            incrementalAllExec(spark, reader, writer, state, htfRoot, sp,
              allowIncomplete, repairLookbackMinutes, snap,
              latestOverride = latestFor, sourceOverride = shared,
              maxBucketsPerTick = effCap, pollBudgetMs = effBudget)
          else IncrementalResult(0, 0, 0, 0,
            storedBy(sp.name).flatMap(_.lagMinutes)))
      }
      // close the budget loop: record this poll's (scanning-specs,
      // scanned, wall) observation for the two-term fit, and keep the
      // legacy single-term EWMA updated — it remains the marginal-term
      // fallback until the model has ≥2 non-collinear observations
      // (and the explicit seeding knob for deployments that know
      // their hardware).
      if (effBudget > 0 && specWindows.nonEmpty) {
        // record every poll that actually launched spec scans — a capped
        // poll whose window held only calendar gap (scanned = 0, sparse
        // corpus) still paid the per-spec fixed machinery, and its
        // (liveSpecs, 0, wall) triple anchors the two-term fit's FIXED
        // term directly (r20: the old scanned>0 gate starved the model
        // of its second observation on sparse corpora — one scan poll +
        // one gap poll left cost_obs_present=false). Token-skip polls
        // never reach here (specWindows is empty for them). The EWMA
        // marginal estimate still needs scanned > 0.
        val scanned = results.map(_._2.bucketsScanned).sum
        val elapsedMs = (System.nanoTime() - t0) / 1e6
        state.addCostObservation(specWindows.size.toLong, scanned, elapsedMs)
        if (scanned > 0) {
          val measured = math.min(100.0, math.max(0.01,
            math.max(elapsedMs - SteadyFloorMs, 1.0) / scanned))
          val prev = state.getCostPerBucketMs.getOrElse(DefaultBucketCostMs)
          state.setCostPerBucketMs(0.5 * prev + 0.5 * measured)
        }
      }
      results
    } finally shared.foreach { df => df.unpersist(); () }
  }

  /** Budget-derived cap constants (VERDICT r17 #4): the cost seed is
    * the r17 FleetTickProbe measurement (0.11–0.18 ms per scanned
    * bucket at width 10k × 12 specs on local[32]); the steady floor is
    * the measured fixed per-poll overhead (ledger snapshot + latest
    * scan + state writes) the cap math must reserve before spending
    * the rest on buckets. */
  private[graft] val DefaultBucketCostMs = 0.15
  private[graft] val SteadyFloorMs = 6000L
  private[graft] val MaxCostObservations = 8

  /** Last budget derivation, probe/spec-visible (driver-side only —
    * the daemon poll loop IS single-driver by contract). Telemetry,
    * never control flow. */
  private[graft] object BudgetTelemetry {
    @volatile var lastModel: (Double, Double) = (0.0, 0.0)
    @volatile var lastDerivedCap: Int = 0
  }

  /** Two-term poll cost fit (VERDICT r18 #2): least squares of
    * wall ≈ fixedPerSpec × liveSpecs + marginal × scanned (no
    * intercept) over the rolling (liveSpecs, scanned, wall)
    * observations. The fixed term is PER SCANNING SPEC, not per poll
    * — the r19 width-10k probe data shows poll wall tracks
    * ~4 s × live-specs + ~0.13 ms × buckets, and a per-poll intercept
    * mis-fits drains whose live set shrinks as specs converge
    * (the first feasible-budget leg measured fixed collapsing to 0
    * and the marginal absorbing it). Needs ≥2 non-collinear points;
    * returns None otherwise (caller falls back to the seeded r18
    * closed form). Zero-SCAN observations are usable — a capped poll
    * that crossed only calendar gap samples w ≈ fixed × liveSpecs
    * directly, the cleanest fixed-term anchor there is (r20; on
    * sparse corpora they can be half the drain's polls) — the
    * collinearity guard still rejects an all-gap set, which cannot
    * price the marginal. Marginal clamps to the r18 EWMA's
    * [0.01, 100] ms/bucket band, fixed to [0, 60 s] — one
    * pathological poll must not blow the model out. */
  private[graft] def fitCostModel(
      obs: Seq[(Long, Long, Double)]): Option[(Double, Double)] = {
    val usable = obs.filter { case (l, s, w) => l > 0 && s >= 0 && w > 0 }
    if (usable.size < 2) return None
    var sll, sss, sls, slw, ssw = 0.0
    usable.foreach { case (l, s, w) =>
      val ld = l.toDouble; val sd = s.toDouble
      sll += ld * ld; sss += sd * sd; sls += ld * sd
      slw += ld * w; ssw += sd * w
    }
    val det = sll * sss - sls * sls
    if (det <= 1e-9 * sll * sss) return None // collinear: can't separate
    val f = (slw * sss - ssw * sls) / det
    val m = (ssw * sll - slw * sls) / det
    Some((math.min(60000.0, math.max(0.0, f)),
      math.min(100.0, math.max(0.01, m))))
  }

  /** Calendar buckets spanned by [start, latest] for `sp` — the
    * per-symbol backlog estimate behind budget cap sizing (observed
    * buckets ≤ calendar buckets, so sparse lakes land UNDER budget —
    * the safe direction). */
  private[graft] def bucketsSpanned(sp: graft.schema.TimeframeSpec,
                                    start: Instant, latest: Instant): Long =
    if (latest.isBefore(start)) 0L
    else sp.fixedMinutes match {
      case Some(m) =>
        ChronoUnit.MINUTES.between(start, sp.floorInstant(latest)) / m + 1
      case None =>
        var c = 0L
        var t = start
        while (!t.isAfter(latest) && c < 100000L) { c += 1; t = sp.addBuckets(t) }
        c
    }

  /** Budget-cap floor: below ~this many buckets per symbol per poll,
    * per-spec fixed costs dominate and shrinking the cap further makes
    * every poll SLOWER per unit of progress (measured, width 10k × 12
    * specs: cap=20 polls drained 200–650k buckets at 27–108 s; the
    * unfloored spiral reached cap=1 polls doing 50k buckets in
    * 160–190 s). The r17-validated amortization point. */
  private[graft] val MinBudgetCap = 20

  /** Partition-change detection (reference `aggregator/main.py:102-137`):
    * diff of partition-directory snapshots; any change re-triggers
    * backfill. */
  def partitionChange(previous: Set[String], current: Set[String]): Boolean =
    previous != current
}
