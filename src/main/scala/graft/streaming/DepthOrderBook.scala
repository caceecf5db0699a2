package graft.streaming

import scala.collection.mutable

final class DepthSyncError(msg: String) extends RuntimeException(msg)

object DepthOrderBook {
  /** Serializable book state for streaming GroupState (deltas stored as
    * 2-element arrays — tuple-in-seq encodes as struct arrays). */
  final case class BufferedDiff(eventTime: Long, firstUpdateId: Long,
                                finalUpdateId: Long, bidDeltas: Seq[Seq[Double]],
                                askDeltas: Seq[Seq[Double]],
                                previousFinalUpdateId: Option[Long])
  final case class BookState(bids: Map[Double, Double], asks: Map[Double, Double],
                             lastUpdateId: Option[Long], synced: Boolean,
                             degraded: Boolean, buffer: Seq[BufferedDiff])
}

/** L2 depth diff event (reference `sources/websocket.py:197-206`).
  * Deltas are (price, qty); qty <= 0 removes the level. */
final case class DepthDiffEvent(
    symbol: String,
    eventTime: Long,
    firstUpdateId: Long,
    finalUpdateId: Long,
    bidDeltas: Seq[(Double, Double)],
    askDeltas: Seq[(Double, Double)],
    previousFinalUpdateId: Option[Long] = None)

/** Stateful L2 order book — faithful port of the reference's
  * `DepthOrderBook` (`sources/websocket.py:234-413`): REST snapshot +
  * diff stream with buffer-until-sync, `pu`/`U`/`u` continuity checks,
  * degrade-on-break, and the best_bid < best_ask invariant. Used as the
  * per-key state inside `flatMapGroupsWithState` (ST2) — the class
  * itself is single-threaded by design, exactly like one group's state.
  */
final class DepthOrderBook {
  private val bids = mutable.Map[Double, Double]()
  private val asks = mutable.Map[Double, Double]()
  private var buffer = Vector[DepthDiffEvent]()
  private var lastUpdateIdOpt: Option[Long] = None
  private var synchronizedFlag = false
  private var degradedFlag = false

  def isSynchronized: Boolean = synchronizedFlag
  def degraded: Boolean = degradedFlag
  def lastUpdateId: Option[Long] = lastUpdateIdOpt

  def markDegraded(): Unit = { degradedFlag = true; synchronizedFlag = false }
  def clearDegraded(): Unit = degradedFlag = false

  def bufferEvent(event: DepthDiffEvent): Unit =
    buffer = (buffer :+ event).sortBy(_.finalUpdateId)

  def syncFromSnapshot(lastUpdateId: Long, snapBids: Seq[(Double, Double)],
                       snapAsks: Seq[(Double, Double)]): Unit = {
    bids.clear(); asks.clear()
    snapBids.foreach { case (p, q) => if (q > 0) bids(p) = q }
    snapAsks.foreach { case (p, q) => if (q > 0) asks(p) = q }
    lastUpdateIdOpt = Some(lastUpdateId)
    synchronizedFlag = true
    clearDegraded()

    if (buffer.isEmpty) { validateBookSpread(); return }
    val filtered = buffer.filter(_.finalUpdateId >= lastUpdateId)
    buffer = Vector.empty
    if (filtered.isEmpty) { validateBookSpread(); return }

    val first = filtered.head
    if (!(first.firstUpdateId <= lastUpdateId && lastUpdateId <= first.finalUpdateId)) {
      markDegraded()
      throw new DepthSyncError(
        "Invalid first diff event after snapshot: expected U <= lastUpdateId <= u, " +
          s"got U=${first.firstUpdateId}, u=${first.finalUpdateId}, lastUpdateId=$lastUpdateId")
    }
    filtered.foreach(applyEvent)
  }

  def applyEvent(event: DepthDiffEvent): Unit = {
    if (!synchronizedFlag || lastUpdateIdOpt.isEmpty) { bufferEvent(event); return }
    val lastU = lastUpdateIdOpt.get
    if (event.finalUpdateId <= lastU) return

    val expectedNext = lastU + 1
    event.previousFinalUpdateId match {
      case Some(pu) if pu != lastU =>
        markDegraded()
        throw new DepthSyncError(
          s"Depth continuity broken on pu check: pu=$pu, last_u=$lastU")
      case None if event.firstUpdateId > expectedNext =>
        markDegraded()
        throw new DepthSyncError(
          s"Depth continuity broken on U check: U=${event.firstUpdateId}, expected<=$expectedNext")
      case _ =>
    }
    applyDeltas(bids, event.bidDeltas)
    applyDeltas(asks, event.askDeltas)
    lastUpdateIdOpt = Some(event.finalUpdateId)
    validateBookSpread()
  }

  private def applyDeltas(side: mutable.Map[Double, Double],
                          deltas: Seq[(Double, Double)]): Unit =
    deltas.foreach { case (p, q) => if (q <= 0) side.remove(p) else side(p) = q }

  private def validateBookSpread(): Unit =
    (bestBid, bestAsk) match {
      case (Some(b), Some(a)) if b >= a =>
        markDegraded()
        throw new DepthSyncError(
          s"Order book invariant broken: best_bid must be < best_ask (best_bid=$b, best_ask=$a)")
      case _ =>
    }

  def bestBid: Option[Double] = if (bids.isEmpty) None else Some(bids.keys.max)
  def bestAsk: Option[Double] = if (asks.isEmpty) None else Some(asks.keys.min)

  // ---- state export/import so the book can live inside a streaming
  // GroupState (serialized between micro-batches)

  def exportState: DepthOrderBook.BookState =
    DepthOrderBook.BookState(bids.toMap, asks.toMap, lastUpdateIdOpt,
      synchronizedFlag, degradedFlag,
      buffer.map(e => DepthOrderBook.BufferedDiff(e.eventTime, e.firstUpdateId,
        e.finalUpdateId, e.bidDeltas.map(d => Seq(d._1, d._2)),
        e.askDeltas.map(d => Seq(d._1, d._2)), e.previousFinalUpdateId)))

  def importState(symbol: String, s: DepthOrderBook.BookState): Unit = {
    bids.clear(); bids ++= s.bids
    asks.clear(); asks ++= s.asks
    lastUpdateIdOpt = s.lastUpdateId
    synchronizedFlag = s.synced
    degradedFlag = s.degraded
    buffer = s.buffer.map(b => DepthDiffEvent(symbol, b.eventTime, b.firstUpdateId,
      b.finalUpdateId, b.bidDeltas.map(d => (d(0), d(1))),
      b.askDeltas.map(d => (d(0), d(1))), b.previousFinalUpdateId)).toVector
  }

  /** Walk asks to fill `notionalUsdt`: (avg_exec - mid) / mid, plus a
    * fillable flag (ST3, reference `websocket.py:357-389`). */
  def computeBuyPriceImpact(notionalUsdt: Double = 100000.0): (Option[Double], Boolean) =
    (bestBid, bestAsk) match {
      case (Some(b), Some(a)) =>
        val mid = (b + a) / 2.0
        if (mid <= 0) return (None, false)
        var remaining = notionalUsdt
        var totalCost = 0.0
        var totalQty = 0.0
        val it = asks.toSeq.sortBy(_._1).iterator
        while (it.hasNext && remaining > 1e-9) {
          val (price, qty) = it.next()
          if (qty > 0) {
            val levelNotional = price * qty
            val take = math.min(remaining, levelNotional)
            totalCost += take
            totalQty += take / price
            remaining -= take
          }
        }
        if (remaining > 1e-9 || totalQty <= 0) (None, false)
        else (Some((totalCost / totalQty - mid) / mid), true)
      case _ => (None, false)
    }

  /** (spread_pct, avg top-N bid qty, avg top-N ask qty) — ST4,
    * reference `websocket.py:391-413`. */
  def computeHealthMetrics(levelCount: Int = 10): (Option[Double], Option[Double], Option[Double]) =
    (bestBid, bestAsk) match {
      case (Some(b), Some(a)) =>
        val mid = (b + a) / 2.0
        if (mid <= 0) return (None, None, None)
        val spreadPct = (a - b) / mid
        val bidLevels = bids.toSeq.sortBy(-_._1).take(levelCount).map(_._2)
        val askLevels = asks.toSeq.sortBy(_._1).take(levelCount).map(_._2)
        (Some(spreadPct),
          if (bidLevels.nonEmpty) Some(bidLevels.sum / bidLevels.size) else None,
          if (askLevels.nonEmpty) Some(askLevels.sum / askLevels.size) else None)
      case _ => (None, None, None)
    }
}
