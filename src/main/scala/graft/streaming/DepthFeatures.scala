package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful depth pipeline (ST2–ST4): the L2 order book lives as
  * per-symbol state inside `flatMapGroupsWithState`; snapshot messages
  * (the REST depth snapshot, unioned in as a control stream) resync it,
  * diff messages maintain it, and each processed message batch emits
  * per-minute depth features (update-id span, 100k price impact,
  * fillable flag, spread/health, degraded flag) — reference
  * `sources/websocket.py:234-413` driven by the collector loop
  * `websocket.py:1488-1586`.
  */
object DepthFeatures extends Serializable {

  /** Flat message union (snapshot vs diff) — one encodable shape.
    * Deltas are 2-element [price, qty] arrays. */
  final case class DepthMsg(
      symbol: String, isSnapshot: Boolean, eventTime: Long,
      firstUpdateId: Long, finalUpdateId: Long, lastUpdateId: Long,
      bidDeltas: Seq[Seq[Double]], askDeltas: Seq[Seq[Double]],
      previousFinalUpdateId: Option[Long])

  object DepthMsg {
    def diff(e: DepthDiffEvent): DepthMsg =
      DepthMsg(e.symbol, isSnapshot = false, e.eventTime, e.firstUpdateId,
        e.finalUpdateId, 0L, e.bidDeltas.map(d => Seq(d._1, d._2)),
        e.askDeltas.map(d => Seq(d._1, d._2)), e.previousFinalUpdateId)

    def snapshot(symbol: String, eventTime: Long, lastUpdateId: Long,
                 bids: Seq[(Double, Double)], asks: Seq[(Double, Double)]): DepthMsg =
      DepthMsg(symbol, isSnapshot = true, eventTime, 0L, 0L, lastUpdateId,
        bids.map(d => Seq(d._1, d._2)), asks.map(d => Seq(d._1, d._2)), None)
  }

  final case class DepthMinuteFeatures(
      symbol: String, timestampMs: Long, hasDepth: Boolean,
      updateIdStart: Option[Long], updateIdEnd: Option[Long],
      priceImpact100k: Option[Double], impactFillable: Option[Boolean],
      spreadPct: Option[Double], avgBidDepth: Option[Double],
      avgAskDepth: Option[Double], depthDegraded: Boolean)

  /** Apply one ordered message batch to a book, tolerating sync errors
    * (the reference marks the book degraded and the supervisor resyncs —
    * `websocket.py:2121-2306`); returns per-minute features observed in
    * this batch. Each minute's features are snapshotted from the book
    * state AT THAT MINUTE'S LAST MESSAGE (when the stream moves past it),
    * so a long batch replay yields evolving per-minute features rather
    * than stamping the final book on all of history. */
  def applyBatch(book: DepthOrderBook, msgs: Seq[DepthMsg]): Seq[DepthMinuteFeatures] = {
    val out = Vector.newBuilder[DepthMinuteFeatures]
    var curMinute = Long.MinValue
    var span: (Long, Long) = (0L, 0L)
    val symbol = msgs.headOption.map(_.symbol).getOrElse("")

    def snapshotMinute(): Unit = if (curMinute != Long.MinValue) {
      val synced = book.isSynchronized
      val (impact, fillable) =
        if (synced) book.computeBuyPriceImpact() else (None, false)
      val (spreadPct, avgBid, avgAsk) =
        if (synced) book.computeHealthMetrics() else (None, None, None)
      // degraded if sync broke, never synced, unfillable, wide spread or
      // thin book (websocket.py:1823-1843)
      val degraded = book.degraded || !synced || !fillable ||
        spreadPct.exists(_ > 0.02) ||
        avgBid.exists(_ < 1.0) || avgAsk.exists(_ < 1.0)
      out += DepthMinuteFeatures(symbol, curMinute, hasDepth = true,
        Some(span._1), Some(span._2), impact, Some(fillable),
        spreadPct, avgBid, avgAsk, degraded)
    }

    for (m <- msgs.sortBy(m => (m.eventTime, m.finalUpdateId))) {
      if (!m.isSnapshot) {
        val minute = LiveCollector.floorToMinuteMs(m.eventTime)
        if (minute != curMinute) {
          snapshotMinute()
          curMinute = minute
          span = (m.firstUpdateId, m.finalUpdateId)
        } else {
          span = (math.min(span._1, m.firstUpdateId),
            math.max(span._2, m.finalUpdateId))
        }
      }
      try {
        if (m.isSnapshot)
          book.syncFromSnapshot(m.lastUpdateId,
            m.bidDeltas.map(d => (d(0), d(1))), m.askDeltas.map(d => (d(0), d(1))))
        else
          book.applyEvent(DepthDiffEvent(m.symbol, m.eventTime, m.firstUpdateId,
            m.finalUpdateId, m.bidDeltas.map(d => (d(0), d(1))),
            m.askDeltas.map(d => (d(0), d(1))), m.previousFinalUpdateId))
      } catch { case _: DepthSyncError => /* degraded; await resync */ }
    }
    snapshotMinute()
    out.result()
  }

  /** Batch form (replay over an events table). */
  def depthFeaturesBatch(msgs: Dataset[DepthMsg]): Dataset[DepthMinuteFeatures] = {
    implicit val enc = Encoders.product[DepthMinuteFeatures]
    msgs.groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroups { (symbol: String, it: Iterator[DepthMsg]) =>
        applyBatch(new DepthOrderBook, it.toSeq).iterator
      }
  }

  /** Streaming form: book state persists across micro-batches in
    * GroupState, keyed by symbol. */
  def depthFeaturesStream(msgs: Dataset[DepthMsg]): Dataset[DepthMinuteFeatures] = {
    implicit val outEnc = Encoders.product[DepthMinuteFeatures]
    implicit val stateEnc = Encoders.product[DepthOrderBook.BookState]

    def update(symbol: String, rows: Iterator[DepthMsg],
               state: GroupState[DepthOrderBook.BookState]): Iterator[DepthMinuteFeatures] = {
      val book = new DepthOrderBook
      state.getOption.foreach(book.importState(symbol, _))
      val out = applyBatch(book, rows.toSeq)
      state.update(book.exportState)
      out.iterator
    }

    msgs.groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
