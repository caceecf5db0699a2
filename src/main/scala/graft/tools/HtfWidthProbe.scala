package graft.tools

import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.operators.AggregatorRunner
import graft.operators.AggregatorRunner.AggregatorStateStore
import graft.schema.Timeframes
import graft.sources.{HtfLakeWriter, MinuteLakeReader}

/** HTF-daemon width probe (VERDICT r8 #7): `runBackfillAll` /
  * `runIncrementalAll` over 10/100/1000-symbol minute lakes of the
  * same per-symbol depth. The READ path was proven flat at width in r8
  * (ServiceScaleProbe); this closes the WRITE path: one Spark pipeline
  * regardless of width (no per-symbol planning loop), wall scaling
  * with data volume, and a near-no-op incremental pass after the
  * backfill (watermarks + existing-complete index make the rerun cheap).
  *
  * Run: `sbt "runMain graft.tools.HtfWidthProbe [widths-csv] [tf]"`
  * (defaults 10,100,1000 / 1h). */
object HtfWidthProbe {
  def main(args: Array[String]): Unit = {
    val widths = args.headOption.map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(10, 100, 1000))
    val tf = args.lift(1).getOrElse("1h")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft-htf-width").toString
    val spec = Timeframes.parse(tf)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    for (w <- widths) {
      val root = s"$tmp/lake_$w"
      ServiceScaleProbe.buildLake(spark, root, w)
      val reader = new MinuteLakeReader(root)
      val writer = new HtfLakeWriter(s"$root/htf")
      val state = new AggregatorStateStore(s"$root/_aggstate")

      val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val (res, backfillSecs) = timed {
        AggregatorRunner.runBackfillAll(spark, reader, writer, state,
          s"$root/htf", spec)
      }
      val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobsBefore
      // incremental rerun with nothing new: the cheap steady-state tick
      val (inc, incSecs) = timed {
        AggregatorRunner.runIncrementalAll(spark, reader, writer, state,
          s"$root/htf", spec)
      }
      println(f"[htf-width] width=$w%4d tf=$tf " +
        f"backfill=$backfillSecs%.1f s (buckets=${res.bucketsWritten}, sparkJobs=$jobs) " +
        f"incrementalNoop=$incSecs%.1f s (buckets=${inc.bucketsWritten})")
    }
    spark.stop()
  }
}
