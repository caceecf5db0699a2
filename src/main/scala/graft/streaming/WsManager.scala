package graft.streaming

import scala.collection.mutable

/** WS connection machinery — the reference's `BinanceWebSocketWorker`
  * run loop (`sources/websocket.py:2081-2118`) and the per-symbol
  * subscription manager (`live_data_api_service/ws_manager.py:76-190`).
  * Pure driver-side choreography: the socket itself is abstracted so
  * everything is deterministic and offline-testable; clocks and sleeps
  * are injected (no wall-clock in logic, SURVEY §7.3).
  */
object WsManager {

  /** One live connection attempt: `recv` returns the next raw payload,
    * None on read timeout (the loop just polls the stop flag again),
    * and throws to signal a broken connection. */
  trait Connection {
    def recv(): Option[String]
    def close(): Unit = ()
  }

  /** Reconnecting read loop (reference `_run_loop`/`_run_once`): connect,
    * publish connection-up, drain messages until stop or failure, publish
    * down, sleep the reconnect interval, repeat. Non-JSON payloads are
    * dropped by the caller's onMessage (parsing lives in
    * [[WsPayloadProcessor]]). */
  final class Worker(name: String,
                     connect: () => Connection,
                     onMessage: (String, Long) => Unit,
                     onConnectionChange: Boolean => Unit = _ => (),
                     reconnectMs: Long = 2000,
                     sleep: Long => Unit = Thread.sleep,
                     now: () => Long = () => System.currentTimeMillis()) {

    @volatile private var stopped = false
    private var thread: Option[Thread] = None

    def requestStop(): Unit = stopped = true

    def start(): Unit = synchronized {
      if (thread.exists(_.isAlive)) return
      stopped = false
      val t = new Thread(() => runLoop(), s"ws-worker-$name")
      t.setDaemon(true)
      t.start()
      thread = Some(t)
    }

    def stop(): Unit = {
      requestStop()
      thread.foreach(_.join(5000))
    }

    /** The loop body, callable directly in tests (single-threaded). */
    def runLoop(): Unit = {
      while (!stopped) {
        try {
          val conn = connect()
          try {
            onConnectionChange(true)
            while (!stopped) {
              conn.recv() match {
                case Some(payload) => onMessage(payload, now())
                case None          => // read timeout → re-check stop flag
              }
            }
          } finally conn.close()
        } catch {
          case _: Exception => // connection failed or broke mid-read
        } finally onConnectionChange(false)
        if (!stopped) sleep(reconnectMs)
      }
    }
  }

  private final case class Subscription[C](collector: C, stop: () => Unit,
                                           var lastTouch: Long)

  /** Per-symbol subscription manager (reference `SymbolWsManager`):
    * `touch` returns the symbol's collector, starting a subscription if
    * needed; at the capacity cap the least-recently-touched symbol is
    * evicted; `cleanupIdle` stops subscriptions idle past the timeout
    * (the reference runs it on a background thread every 30 s — here
    * it is a method the host schedules). */
  final class SymbolWsManager[C](create: String => (C, () => Unit),
                                 maxSubscriptions: Int = 50,
                                 idleTimeoutMs: Long = 300000,
                                 now: () => Long = () => System.currentTimeMillis()) {

    private val subs = mutable.LinkedHashMap[String, Subscription[C]]()

    def touch(symbol: String): C = synchronized {
      val key = symbol.toUpperCase
      subs.get(key) match {
        case Some(s) =>
          s.lastTouch = now()
          s.collector
        case None =>
          if (subs.size >= math.max(1, maxSubscriptions)) {
            val lru = subs.minBy(_._2.lastTouch)._1
            subs.remove(lru).foreach(_.stop())
          }
          val (collector, stop) = create(key)
          subs(key) = Subscription(collector, stop, now())
          collector
      }
    }

    /** Active collector without starting/refreshing a subscription. */
    def getCollector(symbol: String): Option[C] = synchronized {
      subs.get(symbol.toUpperCase).map(_.collector)
    }

    def activeSymbols: Seq[String] = synchronized(subs.keys.toSeq)

    /** Stop subscriptions idle past the timeout; returns evicted symbols. */
    def cleanupIdle(): Seq[String] = synchronized {
      val t = now()
      val idle = subs.filter { case (_, s) => t - s.lastTouch > idleTimeoutMs }
        .keys.toSeq
      idle.foreach(k => subs.remove(k).foreach(_.stop()))
      idle
    }

    def stopAll(): Unit = synchronized {
      subs.values.foreach(_.stop())
      subs.clear()
    }
  }
}
