package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.LiveCollector
import graft.streaming.LiveCollector.LiquidationEvent

/** Liquidation-accumulator state-eviction soak (VERDICT r10 #7).
  *
  * `StreamingScaleProbe` shows liq state rows = symbols × OPEN minutes;
  * the open question is whether the ProcessingTimeTimeout eviction
  * actually BOUNDS that state over a long cadence, or whether rows grow
  * with total minutes streamed. This probe feeds `width` symbols
  * through `minutes` synthetic minutes (paced by `paceMs`, drained by a
  * 2 s processing-time trigger) and samples the state-store row count
  * per fed minute, twice:
  *
  *  - eviction ON, with a compressed timeout (`timeoutSecs`, default
  *    5 s of wall clock standing in for the production 3 min — the
  *    mechanism is identical, only the horizon differs; the production
  *    default stays "3 minutes") and a real `paceMs` sleep between
  *    minutes so processing time actually passes;
  *  - eviction OFF (the control): same feed, same pacing.
  *
  * PASS = the eviction run's row curve PLATEAUS (max ≈ symbols ×
  * ceil(timeout / pace) + in-flight batch, and the last-batch count is
  * far below symbols × minutes) while the control grows linearly to
  * exactly symbols × minutes. The printed table is the annex artifact.
  *
  * Run: `sbt "runMain graft.tools.LiqSoakProbe [width] [minutes]
  * [timeoutSecs] [paceMs]"` (defaults 1000, 120, 5, 1000).
  */
object LiqSoakProbe {
  def main(args: Array[String]): Unit = {
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(1000)
    val minutes = args.lift(1).flatMap(_.toIntOption).getOrElse(120)
    val timeoutSecs = args.lift(2).flatMap(_.toIntOption).getOrElse(5)
    val paceMs = args.lift(3).flatMap(_.toLongOption).getOrElse(1000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val m0 = 1767175200000L // 2026-01-15T10:00:00Z, minute-aligned
    val syms = (0 until width).map(i => f"SYM$i%04d")

    def drive(evict: Boolean): (Seq[Long], Long, Long, Double) = {
      val stream = MemoryStream[LiquidationEvent]
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-liqsoak").toString
      // the eviction mode MUST bound its trigger cadence: with a
      // processing-time timeout the stateful operator requests a batch
      // on every trigger even with no data (the timeout sweep), and the
      // default as-fast-as-possible trigger turns that into a
      // continuous empty-batch churn that starves the feed loop
      // (measured: the un-triggered soak crawled to ~30 s/minute at
      // width 1000). A bounded 2 s trigger = one sweep per couple of
      // pace intervals, the production cadence shape.
      val query = LiveCollector.liquidationMinuteFeaturesStream(
          stream.toDS(), cleanupTimeout = evict,
          timeoutDuration = s"$timeoutSecs seconds")
        .writeStream.outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("2 seconds"))
        .option("checkpointLocation", ckpt)
        .format("noop").start()
      // the feed is paced by sleep ONLY — no per-minute
      // processAllAvailable barrier. With a processing-time timeout the
      // sweep batches keep the stream's no-new-data flag false, so a
      // per-minute processAllAvailable stalls ~10 s per call (measured:
      // a 120-minute feed crawled past 45 real minutes); the cadence
      // probe instead samples state rows from recentProgress while the
      // 2 s trigger drains the queue, and barriers ONCE at the end.
      val rows = scala.collection.mutable.ArrayBuffer[Long]()
      val t0 = System.nanoTime()
      for (m <- 0 until minutes) {
        // 3 events per symbol-minute — state size is per-KEY, so the
        // per-minute event volume is irrelevant to the soak's question
        val batch = for (s <- syms; e <- 0 until 3) yield
          LiquidationEvent(s, m0 + m * 60000L + e * 15000L,
            if (e % 2 == 0) "BUY" else "SELL", 100.0 + e, 1.5,
            arrivalTime = Some(m0 + m * 60000L + e * 15000L + 40),
            origQuantity = Some(2.0), executedQuantity = Some(1.5))
        stream.addData(batch)
        Thread.sleep(paceMs)
        rows += query.recentProgress.lastOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal).getOrElse(-1L)
        if ((m + 1) % 15 == 0) {
          println(s"[liq-soak] ..progress evict=$evict minute=${m + 1}/$minutes rows=${rows.last}")
          Console.flush()
        }
      }
      // settle instead of processAllAvailable: with a processing-time
      // timeout the sweep batches keep the stream's no-new-data flag
      // unreliable and processAllAvailable stalls indefinitely (second
      // measured failure mode of that API under timeout sweeps). A
      // bounded poll — two consecutive zero-input progresses — is the
      // correct barrier for this operator shape.
      def settle(maxMs: Long): Unit = {
        val deadline = System.nanoTime() + maxMs * 1000000L
        var zeros = 0
        while (zeros < 2 && System.nanoTime() < deadline) {
          Thread.sleep(1000L)
          zeros = if (query.recentProgress.lastOption.exists(_.numInputRows == 0))
            zeros + 1 else 0
        }
      }
      settle(30000L) // all fed minutes committed
      rows += query.recentProgress.lastOption
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal).getOrElse(-1L)
      val fedRows = rows.last
      // drain: idle past the horizon, then let sweep batches evict the tail
      Thread.sleep(timeoutSecs * 1000L + 3 * paceMs)
      settle(30000L)
      val tail = query.recentProgress.lastOption
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal).getOrElse(-1L)
      val wall = (System.nanoTime() - t0) / 1e9
      query.stop()
      // /dev/shm is RAM-backed and shared — leaked checkpoints from
      // repeated soaks would eat the box's memory
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      (rows.toSeq, fedRows, tail, wall)
    }

    for (evict <- Seq(true, false)) {
      val (rows, fedRows, tail, wall) = drive(evict)
      val label = if (evict) s"evict(${timeoutSecs}s)" else "control(no-evict)"
      val curve = rows.grouped(math.max(1, rows.size / 12)).map(_.last).mkString(",")
      println(f"[liq-soak] mode=$label%-18s symbols=$width minutes=$minutes " +
        f"pace=${paceMs}ms wall=$wall%.0f s maxRows=${rows.max} " +
        f"allFedRows=$fedRows afterDrainRows=$tail " +
        f"linearBound=${width.toLong * minutes} curve=[$curve]")
    }
    spark.stop()
  }
}
