package graft.tools

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.AggregatorRunner
import graft.operators.AggregatorRunner.AggregatorStateStore
import graft.schema.Timeframes
import graft.sources.{CommitProtocol, DayManifestCommit, HtfLakeWriter,
  LakeLayout, ManifestCommit, MinuteLakeReader, MinuteLakeWriter,
  PartitionLedger, RenameCommit}

/** Prices the ManifestCommit deployment END-TO-END (VERDICT r16 #2):
  * every leg runs twice — identity committer ([[RenameCommit]]) vs
  * [[ManifestCommit]] — over the same hourly lake shape, so the
  * manifest seam's cost is a table, not a guess. The manifest protocol
  * is the object-store deployment (SURVEY §4.1); its correctness is
  * pinned by CommitSeamSpec — this probe pins what it COSTS:
  *
  *  1. per-leaf PUBLISH (the bulk-ingest seam): one commit per
  *     symbol-hour leaf — rename-only vs version-rename + manifest PUT
  *     + GC listing;
  *  2. per-leaf RE-PUBLISH over an existing version (the repair shape:
  *     grace bookkeeping + superseded-version GC);
  *  3. windowed READ at width (readWindowAllSymbols 3 h × width):
  *     plain subtree scan vs window-bounded leaf walk + per-leaf
  *     manifest resolution;
  *  4. latest-minute scan (the tick's steady prelude);
  *  5. one INCREMENTAL 15m tick (the busy-poll shape): identity bulk
  *     HTF write (one dynamic-overwrite job) vs manifest per-leaf
  *     committed HTF writes — the documented price of pointer-committed
  *     bulk writes on the hourly layout (`writeBucketsBulkCommitted`).
  *
  * The probe runs on the local FS: rename costs are LOWER here than on
  * a real object store, so the manifest-vs-identity RATIO is what
  * transfers (absolute walls are a lower bound for S3-class stores —
  * there the manifest's one-PUT commit replaces a copy+delete "rename"
  * and the comparison inverts in the manifest's favor).
  *
  * Run: `sbt "runMain graft.tools.ManifestCostProbe [width] [hours]"`
  * (defaults 1000, 24 — 24k leaves per lake).
  */
object ManifestCostProbe {

  private val Day1 = Instant.parse("2024-12-30T00:00:00Z")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(1000)
    val hours = args.lift(1).flatMap(_.toIntOption).getOrElse(24)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = FileSystem.get(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)

    // one staged hourly tree, copied per committer so both lakes see
    // identical bytes: symbol=/year=/month=/day=/hour= leaves
    val stage = java.nio.file.Files.createTempDirectory("graft-mc-stage").toString
    val (_, buildSecs) = timed {
      HtfDepthProbe.minutesFrame(spark, width, Day1, hours.toLong * 60L)
        .withColumn("year", date_format(col("timestamp"), "yyyy"))
        .withColumn("month", date_format(col("timestamp"), "MM"))
        .withColumn("day", date_format(col("timestamp"), "dd"))
        .withColumn("hour", date_format(col("timestamp"), "HH"))
        // cluster by the leading partition column: a round-robin
        // repartition makes EVERY task write EVERY leaf (width × hours
        // × tasks files — measured 674k files for a 24k-leaf lake)
        .repartition(col("symbol"))
        .write.mode("overwrite")
        .partitionBy("symbol", "year", "month", "day", "hour")
        .option("compression", "zstd").parquet(stage)
    }
    // scheme-free paths: globStatus returns file:-scheme URIs, which
    // would survive the stage-prefix strip and nest the lake wrongly
    val leaves = fs.globStatus(
      new HPath(s"$stage/symbol=*/year=*/month=*/day=*/hour=*"))
      .map(_.getPath.toUri.getPath).sorted
    println(f"[mc] width=$width hours=$hours leaves=${leaves.length} " +
      f"build=$buildSecs%.1f s")

    def copyLeafTo(tmpRoot: String, leaf: String): String = {
      val rel = leaf.stripPrefix(stage).stripPrefix("/")
      val dst = new HPath(s"$tmpRoot/$rel")
      fs.mkdirs(dst.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, new HPath(leaf), fs, dst,
        false, spark.sparkContext.hadoopConfiguration)
      dst.toString
    }

    // day-batched committers publish whole (tmp → dest) batches with
    // one pointer PUT per touched day dir (VERDICT r17 #5); the others
    // keep their per-leaf loop
    def publishAll(committer: CommitProtocol,
                   pairs: Seq[(String, String)]): Unit = committer match {
      case b: DayManifestCommit => b.publishBatch(fs, pairs)
      case c => pairs.foreach { case (tmp, dest) => c.publish(fs, tmp, dest) }
    }

    val results = Seq[(String, CommitProtocol)](
      "identity" -> RenameCommit, "manifest" -> ManifestCommit,
      "day-batch" -> DayManifestCommit).map {
      case (label, committer) =>
        val root = java.nio.file.Files.createTempDirectory(s"graft-mc-$label").toString
        val lakeDir = s"$root/futures/um/minute"

        // leg 1: publish of every staged leaf (tmp copies so the stage
        // survives for the later committers)
        val tmpRoot = java.nio.file.Files.createTempDirectory(s"graft-mc-tmp").toString
        val copies = leaves.map(copyLeafTo(tmpRoot, _))
        val (_, pubSecs) = timed {
          publishAll(committer, copies.map { c =>
            c -> s"$lakeDir/${c.stripPrefix(tmpRoot).stripPrefix("/")}"
          })
        }
        println(f"[mc] $label%-9s publish     ${leaves.length} leaves " +
          f"wall=$pubSecs%7.1f s (${pubSecs * 1000 / leaves.length}%6.2f ms/leaf)")

        // leg 2: re-publish ONE day's leaves over the live versions
        // (repair shape: aside-swap vs grace bookkeeping + GC)
        val day1Leaves = leaves.filter(_.contains("day=30"))
        val reTmp = java.nio.file.Files.createTempDirectory("graft-mc-re").toString
        val recopies = day1Leaves.map(copyLeafTo(reTmp, _))
        val (_, repubSecs) = timed {
          publishAll(committer, recopies.zip(day1Leaves).map { case (c, l) =>
            c -> s"$lakeDir/${l.stripPrefix(stage).stripPrefix("/")}"
          })
        }
        fs.delete(new HPath(reTmp), true)
        println(f"[mc] $label%-9s re-publish  ${day1Leaves.length} leaves " +
          f"wall=$repubSecs%7.1f s (${repubSecs * 1000 / day1Leaves.length}%6.2f ms/leaf)")

        val reader = new MinuteLakeReader(root, committer = committer)

        // leg 3: windowed read, 3 h × width
        val (n3, readSecs) = timed {
          reader.readWindowAllSymbols(spark,
            Day1.plus(2, ChronoUnit.HOURS),
            Day1.plus(5, ChronoUnit.HOURS).minusSeconds(60)).get.count()
        }
        println(f"[mc] $label%-9s read-3h     rows=$n3 wall=$readSecs%7.1f s")

        // leg 4: latest-minute scan (tick prelude)
        val (latest, latestSecs) = timed {
          reader.latestMinuteAllSymbols(spark)
        }
        println(f"[mc] $label%-9s latest-scan syms=${latest.size} " +
          f"wall=$latestSecs%7.1f s")

        // leg 5: one incremental 15m tick — identity bulk HTF write vs
        // manifest per-leaf committed HTF writes
        val htf = new HtfLakeWriter(s"$root/htf", LakeLayout.HourlySymbol, committer)
        val state = new AggregatorStateStore(s"$root/_aggstate", committer)
        val (tick, tickSecs) = timed {
          AggregatorRunner.runIncrementalAll(spark, reader, htf, state,
            s"$root/htf", Timeframes.parse("15m"))
        }
        println(f"[mc] $label%-9s tick-15m    written=${tick.bucketsWritten} " +
          f"wall=$tickSecs%7.1f s")

        fs.delete(new HPath(root), true)
        fs.delete(new HPath(tmpRoot), true)
        (label, pubSecs, repubSecs, readSecs, latestSecs, tickSecs)
    }
    fs.delete(new HPath(stage), true)

    val id = results.head
    println("[mc] ---- ratios vs identity ----")
    results.tail.foreach { r =>
      println(f"[mc] ${r._1}%-9s publish ${r._2 / id._2}%5.2fx  " +
        f"re-publish ${r._3 / id._3}%5.2fx  " +
        f"read-3h ${r._4 / id._4}%5.2fx  latest ${r._5 / id._5}%5.2fx  " +
        f"tick ${r._6 / id._6}%5.2fx")
    }
    spark.stop()
  }
}
