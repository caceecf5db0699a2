package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{DepthFeatures, LiveCollector}
import graft.streaming.DepthFeatures.DepthMsg
import graft.streaming.LiveCollector.LiquidationEvent

/** Streaming width probe (VERDICT r8 #6): drives the two stateful live
  * paths — the per-symbol depth book (`depthFeaturesStream`,
  * `flatMapGroupsWithState` keyed by symbol) and the per-(symbol,
  * minute) liquidation accumulators (`liquidationMinuteFeaturesStream`)
  * — with a synthetic multi-symbol generator at increasing symbol
  * widths, one micro-batch per minute (the reference's cadence:
  * hundreds of sockets, 60 s minute roll).
  *
  * Reports per width: events/sec through the stateful operator, mean
  * and max micro-batch latency, and the state store's row count and
  * bytes from the LAST progress (the book path must hold rows ==
  * symbols — state O(depth)·symbols, NOT O(events); the liq path grows
  * rows per open (symbol, minute) until timeout eviction, which is the
  * documented retention knob).
  *
  * Run: `sbt "runMain graft.tools.StreamingScaleProbe [widths-csv]
  * [minutes] [eventsPerSymbolMinute]"` (defaults 10,100,1000 / 5 / 60). */
object StreamingScaleProbe {
  def main(args: Array[String]): Unit = {
    val widths = args.headOption.map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(10, 100, 1000))
    val minutes = args.lift(1).flatMap(_.toIntOption).getOrElse(5)
    val perSymMin = args.lift(2).flatMap(_.toIntOption).getOrElse(60)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val m0 = 1767175200000L // 2026-01-15T10:00:00Z, minute-aligned

    def report(path: String, nSym: Int, events: Long, wallSec: Double,
               prog: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]): Unit = {
      val batchMs = prog.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong)
        .filter(_ > 0)
      val state = prog.lastOption.flatMap(_.stateOperators.headOption)
      println(f"[stream-scale] path=$path symbols=$nSym events=$events " +
        f"wall=$wallSec%.1f s rate=${events / wallSec}%.0f ev/s " +
        f"batchMs(mean=${if (batchMs.isEmpty) 0 else batchMs.sum / batchMs.size}," +
        f"max=${if (batchMs.isEmpty) 0 else batchMs.max}) " +
        f"stateRows=${state.map(_.numRowsTotal).getOrElse(-1L)} " +
        f"stateBytes=${state.map(_.memoryUsedBytes).getOrElse(-1L)}")
    }

    for (nSym <- widths) {
      val syms = (0 until nSym).map(i => f"SYM$i%04d")

      // ---- depth-book path: snapshot + continuous diffs per symbol
      locally {
        val stream = MemoryStream[DepthMsg]
        val ckpt = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), "graft-sprobe").toString
        val query = DepthFeatures.depthFeaturesStream(stream.toDS())
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .format("noop").start()
        var events = 0L
        val t0 = System.nanoTime()
        // snapshots enter first (the supervisor's start() choreography)
        stream.addData(syms.map(s => DepthMsg.snapshot(s, m0 - 1000, 100L,
          Seq((99.0, 1000.0), (98.0, 1000.0)), Seq((101.0, 1000.0), (102.0, 1000.0)))))
        events += nSym
        for (m <- 0 until minutes) {
          val batch = for (s <- syms; e <- 0 until perSymMin) yield {
            val uid = 100L + m.toLong * perSymMin + e + 1
            val px = 99.0 + (e % 20) * 0.1
            DepthMsg(s, isSnapshot = false, m0 + m * 60000L + e * (60000L / perSymMin),
              uid, uid, 0L, Seq(Seq(px, 1000.0 + e)), Seq(Seq(px + 2.0, 1000.0 + e)),
              Some(uid - 1))
          }
          stream.addData(batch)
          events += batch.size
          query.processAllAvailable() // one micro-batch per minute
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val prog = query.recentProgress.toSeq
        query.stop()
        report("depth-book", nSym, events, wall, prog)
      }

      // ---- liq-accumulator path: per-(symbol, minute) state
      locally {
        val stream = MemoryStream[LiquidationEvent]
        val ckpt = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), "graft-sprobe").toString
        val query = LiveCollector.liquidationMinuteFeaturesStream(stream.toDS())
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .format("noop").start()
        var events = 0L
        val t0 = System.nanoTime()
        for (m <- 0 until minutes) {
          val batch = for (s <- syms; e <- 0 until perSymMin) yield
            LiquidationEvent(s, m0 + m * 60000L + e * (60000L / perSymMin),
              if (e % 2 == 0) "BUY" else "SELL", 100.0 + e, 1.5,
              arrivalTime = Some(m0 + m * 60000L + e * (60000L / perSymMin) + 40),
              origQuantity = Some(2.0), executedQuantity = Some(1.5))
          stream.addData(batch)
          events += batch.size
          query.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val prog = query.recentProgress.toSeq
        query.stop()
        report("liq-accum", nSym, events, wall, prog)
      }
    }
    spark.stop()
  }
}
