package graft.streaming

/** Scheduled re-snapshot supervisor around the depth pipeline —
  * reference `BinanceLiveStreamSupervisor` (`websocket.py:2121-2306`):
  * `start()` performs the initial REST snapshot (`start` →
  * `_resync_depth_book`), and every observed output batch is scanned
  * for NEW degraded minutes — the reference's `_on_depth_message`
  * DepthSyncError→resync choreography, surfaced through the feature
  * STREAM rather than an exception callback so it composes with
  * `flatMapGroupsWithState` (the book lives in executor state; the
  * supervisor is driver-side control-loop code, like the reference's
  * thread).
  *
  * On a continuity break the book degrades and NULL-gates its features
  * (`DepthFeatures.applyBatch`); the supervisor sees the degraded
  * minute, fetches a fresh snapshot through the injected transport
  * (`fetch_depth_snapshot`, `websocket.py:2297-2303`), and re-injects
  * it into the control stream. The next micro-batch's
  * `syncFromSnapshot` replays the diffs buffered since the break,
  * clears the degrade flag, and the features recover. A failed fetch
  * leaves the book degraded and is retried on the next observed
  * degraded batch (the reference logs and continues,
  * `websocket.py:2304-2306`).
  */
final class DepthResyncSupervisor(
    symbol: String,
    fetchSnapshot: () => Option[DepthResyncSupervisor.Snapshot],
    inject: DepthFeatures.DepthMsg => Unit,
    nowMs: () => Long = () => System.currentTimeMillis()) {

  private var handledThroughMinute = Long.MinValue
  private var resyncs = 0
  private var failedFetches = 0

  def resyncCount: Int = synchronized(resyncs)
  def failedFetchCount: Int = synchronized(failedFetches)

  /** Initial snapshot before the diff stream starts (reference
    * `start()` → `_resync_depth_book(now_ms())`). */
  def start(): Unit = synchronized { resync(); () }

  /** Feed one micro-batch of output features (e.g. from
    * `foreachBatch`). Resyncs once per NEW degraded minute — Update-mode
    * re-emissions of an already-handled window don't re-fetch. */
  def observe(features: Seq[DepthFeatures.DepthMinuteFeatures]): Unit = synchronized {
    val broken = features
      .filter(f => f.symbol == symbol && f.hasDepth && f.depthDegraded)
      .map(_.timestampMs)
    broken.maxOption.filter(_ > handledThroughMinute).foreach { m =>
      // only advance the handled watermark on a SUCCESSFUL fetch, so a
      // failed snapshot retries when this window is observed again
      if (resync()) handledThroughMinute = m
    }
  }

  private def resync(): Boolean =
    fetchSnapshot() match {
      case Some(s) =>
        inject(DepthFeatures.DepthMsg.snapshot(
          symbol, nowMs(), s.lastUpdateId, s.bids, s.asks))
        resyncs += 1
        true
      case None =>
        failedFetches += 1
        false
    }
}

object DepthResyncSupervisor {
  /** REST depth snapshot shape (`fetch_depth_snapshot` result). */
  final case class Snapshot(lastUpdateId: Long,
                            bids: Seq[(Double, Double)],
                            asks: Seq[(Double, Double)])
}
