package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of the batch
  * latest-wins/exact dedup family (`Ops.dedupKeepLast`,
  * `txt_fingerprint_dedup`).
  *
  * A live WebSocket feed re-delivers events after reconnects
  * (websocket.py:2081-2118 replays from the last stream id), so the
  * collector's sink must be idempotent per event key. Batch dedup can
  * group the whole table; a stream cannot hold unbounded key state, so
  * the state retention is bounded by the WATERMARK: a key is remembered
  * until the watermark passes its event time + delay, which is exactly
  * the window a reconnect replay can straddle.
  *
  * At 100 TB/day of events this is the only shape that works: state per
  * executor is O(keys-in-delay-window), partitioned by the dedup key
  * (Spark hashes keys across the cluster), and expired keys are evicted
  * by the state store on watermark advance — no manual cleanup pass.
  */
object StreamDedup {

  /** Drop duplicate deliveries of the same key from a stream, keeping
    * state only within `delay` of the watermark.
    *
    * @param tsCol   event-time column (TimestampType) the watermark rides
    * @param keyCols identity of an event (e.g. symbol + event id); the
    *                watermark column must NOT be part of the key —
    *                `dropDuplicatesWithinWatermark` dedups re-deliveries
    *                whose timestamps jitter inside the window too
    * @param delay   watermark delay, e.g. "10 minutes" — the longest
    *                reconnect replay the feed can produce
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, keyCols: Seq[String],
                           delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Content-keyed variant: dedup by a fingerprint of payload columns
    * (md5 of the concatenated values) when the feed carries no stable
    * event id. */
  def dedupByFingerprint(df: DataFrame, tsCol: String, payloadCols: Seq[String],
                         delay: String): DataFrame = {
    // concat_ws SKIPS nulls, so (a, null, b) and (a, b, null) would
    // collide; every null becomes an explicit sentinel instead, keeping
    // the fingerprint positional
    val fp = md5(concat_ws("|",
      payloadCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    df.withColumn("__fp", fp)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }
}
