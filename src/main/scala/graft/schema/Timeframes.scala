package graft.schema

import java.time.temporal.ChronoUnit
import java.time.{DayOfWeek, Instant, ZoneOffset, ZonedDateTime}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Higher-timeframe specs + bucket math (reference
  * `aggregator/bucketing.py:16-124`, `live_indicators/timeframes.py`).
  *
  * Bucket flooring is expression-level so it runs distributed:
  * fixed-length frames floor epoch-ms arithmetic (Spark's `date_trunc`
  * has no "3 minute" granularity); calendar frames (1w starts Monday
  * 00:00 UTC, 1M starts day 1) use `date_trunc("week"/"month")`, which
  * matches the reference's Monday/day-1 conventions.
  */
final case class TimeframeSpec(name: String, fixedMinutes: Option[Long]) {

  /** Bucket-start column for a Timestamp column. */
  def bucketStart(ts: Column): Column = fixedMinutes match {
    case Some(m) =>
      val ms = m * 60000L
      timestamp_millis(floor(unix_millis(ts) / ms).cast("long") * ms)
    case None if name == "1w" => date_trunc("week", ts)
    case None => date_trunc("month", ts)
  }

  /** Exclusive bucket end. */
  def bucketEnd(bucketStartCol: Column): Column = fixedMinutes match {
    case Some(m) => timestamp_millis(unix_millis(bucketStartCol) + m * 60000L)
    case None if name == "1w" =>
      timestamp_millis(unix_millis(bucketStartCol) + 7L * 24 * 60 * 60000L)
    case None => to_timestamp(add_months(bucketStartCol, 1))
  }

  /** Expected minutes in the bucket (bucket_end - bucket_start) / 60s. */
  def expectedMinutes(bucketStartCol: Column): Column =
    ((unix_millis(bucketEnd(bucketStartCol)) - unix_millis(bucketStartCol)) / 60000L)
      .cast("long")

  // ---- driver-side (java.time) mirrors of floor_to_bucket / add_bucket

  def floorInstant(t: Instant): Instant = {
    val z = t.atZone(ZoneOffset.UTC).truncatedTo(ChronoUnit.MINUTES)
    val f: ZonedDateTime = fixedMinutes match {
      case Some(m) =>
        val total = z.getHour * 60L + z.getMinute
        val floored = (total / m) * m
        z.withHour((floored / 60).toInt).withMinute((floored % 60).toInt)
      case None if name == "1w" =>
        z.minusDays(z.getDayOfWeek.getValue - DayOfWeek.MONDAY.getValue)
          .truncatedTo(ChronoUnit.DAYS)
      case None => z.withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
    }
    f.toInstant
  }

  def addBuckets(t: Instant, periods: Int = 1): Instant = {
    val z = floorInstant(t).atZone(ZoneOffset.UTC)
    (fixedMinutes match {
      case Some(m) => z.plusMinutes(m * periods)
      case None if name == "1w" => z.plusWeeks(periods.toLong)
      case None => z.plusMonths(periods.toLong)
    }).toInstant
  }

  /** Latest bucket whose full span is covered by source minutes up to
    * `latestSourceMinute` (reference `bucketing.py:117-124`). */
  def latestCompleteBucketStart(latestSourceMinute: Instant): Option[Instant] = {
    val current = floorInstant(latestSourceMinute)
    if (!addBuckets(current).isAfter(latestSourceMinute.plus(1, ChronoUnit.MINUTES)))
      Some(current)
    else {
      val previous = addBuckets(current, -1)
      if (previous.isAfter(latestSourceMinute)) None else Some(previous)
    }
  }
}

object Timeframes {

  // "1m" is the canonical base frame: the HTF aggregator never targets it
  // (reference supports 3m…1M), but the API layer serves 1m bars from the
  // canonical frame directly, so the parser must accept it.
  val supported: Map[String, TimeframeSpec] = Seq(
    "1m" -> Some(1L),
    "3m" -> Some(3L), "5m" -> Some(5L), "10m" -> Some(10L), "15m" -> Some(15L),
    "30m" -> Some(30L), "45m" -> Some(45L), "1h" -> Some(60L), "4h" -> Some(240L),
    "8h" -> Some(480L), "1d" -> Some(1440L), "1w" -> None, "1M" -> None
  ).map { case (n, m) => n -> TimeframeSpec(n, m) }.toMap

  /** HTF-aggregatable timeframes (reference `bucketing.py:16-29`). */
  val supportedNames: Seq[String] =
    Seq("3m", "5m", "10m", "15m", "30m", "45m", "1h", "4h", "8h", "1d", "1w", "1M")

  private val aliases =
    Map("1hr" -> "1h", "4hr" -> "4h", "8hr" -> "8h", "1mo" -> "1M", "1month" -> "1M")

  /** Parse with alias normalization (reference `bucketing.py:38-46`). */
  def parse(value: String): TimeframeSpec = {
    val token0 = value.trim
    require(token0.nonEmpty, "timeframe is required")
    val token = aliases.getOrElse(token0.toLowerCase, token0)
    supported.getOrElse(token,
      throw new IllegalArgumentException(
        s"Unsupported timeframe '$value'. Supported values: ${supportedNames.mkString(", ")}"))
  }
}
